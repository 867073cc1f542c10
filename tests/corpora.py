"""Golden test corpora — fixture DATA transcribed from the reference's
test suite (not code): /root/reference/src/common/test_util.rs:32-59
(corpus A, 5 rows) and :289-399 (corpus B, 10+20 rows), per FIXTURES.md
("copy verbatim when implementing").  Golden scores/counts asserted in
the tests come from the reference's unit tests
(api_bm25_standard_search.rs / api_bm25_nlq_search.rs).
"""

CORPUS_A_COL1 = [
    "Ancient empires rise and fall, shaping history's course.",
    "Artistic expressions reflect diverse cultural heritages.",
    "Social movements transform societies, forging new paths.",
    "Strategic military campaigns alter the balance of power.",
    "Ancient philosophies provide wisdom for modern dilemmas.",
]
CORPUS_A_COL2 = [
    "Brave explorers venture into uncharted territories, expanding horizons.",
    "Brilliant minds unravel nature's judgment through scientific inquiry.",
    "Economic systems evolve, influencing global trade and prosperity.",
    "Environmental challenges demand innovative solutions for sustainability.",
    "Ethical dilemmas test the boundaries of moral reasoning and Judgment.",
]
CORPUS_A_COL3 = [
    "Groundbreaking inventions revolutionize industries and daily life.",
    "Iconic leaders inspire generations with their vision and charisma.",
    "Literary masterpieces capture the essence of the human experience.",
    "Majestic natural wonders showcase the breathtaking beauty of Earth.",
    "Philosophical debates shape our understanding of reality and existence.",
]


def corpus_a_rows():
    return [
        {"doc_id": i, "col1": CORPUS_A_COL1[i], "col2": CORPUS_A_COL2[i],
         "col3": CORPUS_A_COL3[i]}
        for i in range(5)
    ]


PART0_COL1 = [
    "Ancient empires rise and fall, shaping history's course.",
    "Artistic expressions reflect diverse cultural heritages.",
    "Social movements transform societies, forging new paths.",
    "Strategic military campaigns alter the balance of power.",
    "Ancient philosophies provide wisdom for modern dilemmas.",
    "Revolutionary leaders challenge the status quo, inspiring change.",
    "Architectural wonders stand as testaments to human creativity.",
    "Trade routes expand horizons, connecting distant cultures.",
    "Great thinkers challenge societal norms, advancing human thought.",
    "Historic discoveries uncover lost civilizations and their secrets.",
]
PART0_COL2 = [
    "Brave explorers venture into uncharted territories, expanding horizons.",
    "Brilliant minds unravel nature's judgment through scientific inquiry.",
    "Economic systems evolve, influencing global trade and prosperity.",
    "Environmental challenges demand innovative solutions for sustainability.",
    "Ethical dilemmas test the boundaries of moral reasoning and judgment.",
    "Technological innovations disrupt industries, creating new markets.",
    "Education reforms empower future generations with knowledge.",
    "Civic movements advocate for justice and equality.",
    "Art and music fuse to express the unspoken language of cultures.",
    "Medicine advances, pushing the boundaries of human health and longevity.",
]
PART0_COL3 = [
    "Groundbreaking inventions revolutionize industries and daily life.",
    "Iconic leaders inspire generations with their vision and charisma.",
    "Literary masterpieces capture the essence of the human experience.",
    "Majestic natural wonders showcase the breathtaking beauty of Earth.",
    "Philosophical debates shape our understanding of reality and existence.",
    "Scientific breakthroughs offer solutions to global challenges.",
    "Humanitarian efforts alleviate suffering and provide hope.",
    "Sustainable practices protect ecosystems for future generations.",
    "Digital transformation reshapes the way societies function.",
    "Athletic achievements inspire excellence and unity in sports.",
]
PART1_COL1 = [
    "Technological advancements redefine the future of work and leisure.",
    "Historic treaties shape the geopolitical landscape of nations.",
    "Culinary traditions blend to create unique global cuisines.",
    "Dynamic educational methods reshape learning paradigms.",
    "Vibrant festivals celebrate the rich tapestry of human cultures.",
    "Innovative art forms emerge, blending tradition with modernity.",
    "Migration patterns influence cultural exchanges and societal integration.",
    "Social media revolutionizes communication, fostering global connections.",
    "Climate change advocacy prompts action and policy change.",
    "Entrepreneurial ventures spur economic growth and innovation.",
    "Classical music orchestras innovate with modern compositions.",
    "Digital literacy programs bridge the gap between generations.",
    "Healthcare equity becomes a primary focus in policy development.",
    "Art conservation techniques evolve with new science and technology.",
    "Public transportation upgrades reduce congestion and pollution.",
    "Heritage languages are revitalized through educational programs.",
    "Urban renewal projects transform declining areas into vibrant communities.",
    "Data privacy laws strengthen protection for consumers.",
    "Microfinance institutions support small businesses in developing countries.",
    "Disaster-resistant infrastructure mitigates the effects of extreme weather.",
]
PART1_COL2 = [
    "Innovators pioneer sustainable energy solutions to combat climate change.",
    "Researchers decode genetic mysteries, unlocking new medical treatments.",
    "Financial markets adapt to emerging technologies and changing economies.",
    "Urban planners design smart cities for increased livability and efficiency.",
    "Human health rights movements advocate for equality and justice worldwide.",
    "Autonomous vehicles transform the transportation industry.",
    "Cybersecurity measures intensify in response to growing threats.",
    "Space exploration reaches new frontiers, aiming for Mars colonization.",
    "Renewable resources gain prominence, reducing reliance on fossil fuels.",
    "Cultural heritage sites receive modern tech for preservation and education.",
    "Agricultural drones improve crop monitoring and management.",
    "Biodiversity research drives conservation efforts worldwide.",
    "E-learning platforms expand access to education across borders.",
    "Mass transit systems innovate with green technology.",
    "Nutrition science advances understanding of diet and health.",
    "Renewable energy projects proliferate, driven by policy and technology.",
    "Social entrepreneurship tackles societal issues with innovative business models.",
    "Virtual museums make art accessible to a global audience.",
    "Water purification technologies address global drinking water shortages.",
    "Wildlife corridors facilitate animal movement and habitat connectivity.",
]
PART1_COL3 = [
    "Pioneering space missions explore the uncharted realms of the cosmos.",
    "Renowned artists disrupt traditional mediums with digital art.",
    "Global collaborations foster peace and understanding among nations.",
    "Revolutionary sports techniques enhance athlete performance and safety.",
    "Scientific debates highlight the ethical considerations of AI advancements.",
    "Virtual reality revolutionizes training and education sectors.",
    "Oceanic research vessels uncover mysteries of the deep sea.",
    "Archaeological findings rewrite history with new discoveries.",
    "Telehealth becomes integral to modern healthcare systems.",
    "Advancements in robotics automate tasks, improving efficiency and safety.",
    "Augmented reality applications enhance user experiences in various sectors.",
    "Biotechnology firms engineer solutions for environmental and health issues.",
    "Community gardens increase local food production and community engagement.",
    "Drone technology advances impact surveillance, delivery, and entertainment sectors.",
    "Eco-friendly buildings set new standards for sustainable construction.",
    "Futuristic transportation concepts promise speed and sustainability.",
    "Genetic research sheds light on diseases and potential therapies.",
    "Holographic displays revolutionize entertainment and advertising.",
    "Interactive learning tools transform educational experiences.",
    "Job automation trends reshape workforce dynamics and skill demands.",
]


def part0_rows(base_id: int = 0):
    return [
        {"doc_id": base_id + i, "col1": PART0_COL1[i], "col2": PART0_COL2[i],
         "col3": PART0_COL3[i]}
        for i in range(10)
    ]


def part1_rows(base_id: int = 10):
    return [
        {"doc_id": base_id + i, "col1": PART1_COL1[i], "col2": PART1_COL2[i],
         "col3": PART1_COL3[i]}
        for i in range(20)
    ]


# FunctionalFFI English corpus — fixture DATA transcribed from
# /root/reference/tests/unit_test/FunctionalFFI.cpp:50-59
# (indexSomeEnglishDocs): 10 rows x 2 columns, with the 🦠 bytes kept
# verbatim (the suite uses them to pin UTF-8 robustness).
FFI_ENGLISH_COL1 = [
    "Ancient empires rise and fall, shaping history's course.",
    "Social movements transform societies, forging new paths.",
    "Strategic military campaigns alter the balance of power.",
    "Chemical reactions unlock mysteries of nature.",
    "Marriages blend traditions, celebrating love's union.",
    "Innovations 🦠 in technology drive societal progress.",
    "Diplomatic negotiations seek to resolve international conflicts.",
    "Economic theories debate the merits of market systems.",
    "Physics theories delve into the universe's mysteries.",
    "Philosophers debate ethics in the age of artificial intelligence.",
]
FFI_ENGLISH_COL2 = [
    "Artistic expressions reflect diverse cultural heritages.",
    "Economies fluctuate🦠, reflecting the complex interplay of global forces.",
    "Quantum leaps redefine understanding of physical laws.",
    "Philosophical debates ponder the essence of existence.🦠",
    "Explorers discover uncharted territories, expanding world maps.",
    "Environmental conservation efforts protect Earth's biodiversity.",
    "Ancient philosophies provide wisdom for modern dilemmas.",
    "Military strategies evolve with technological advancements.",
    "Chemical compounds play crucial roles in medical breakthroughs.",
    "Wedding ceremonies across cultures symbo🦠lize lifelong commitment.",
]


def ffi_english_rows():
    return [
        {"doc_id": i, "col1": FFI_ENGLISH_COL1[i], "col2": FFI_ENGLISH_COL2[i]}
        for i in range(10)
    ]


# the 10 mixed Chinese-English documents from the reference's tokenizer
# integration test (src/tokenizer/tests/tokenizer_test.rs:44-85) —
# row_id i holds mocked_docs[i] in col1
TOKENIZER_TEST_ZH_EN = [
    "在繁忙的城市生活中，finding tranquility can be challenging. 每天的压力源源不断，"
    "工作和家庭之间的平衡让人疲惫。However, taking time to meditate and relax——即使只是几分钟——"
    "可以帮助我们恢复内心的平静。John Doe 曾经在《The Art of Peace》中提到，冥想是保持内心宁静的关键。",
    "学习一门新的语言不仅仅是掌握语法和词汇。It's also about understanding the culture and "
    "traditions behind it. 例如，学习中文（尤其是汉字）可以帮助你更好地了解中国的历史和风俗——"
    "这是一种深入的文化体验。Linguist Noam Chomsky 在《Syntactic Structures》中强调了语言结构的重要性。",
    "科技的进步改变了我们的生活方式。From smartphones to smart homes, technology is integrated "
    "into every aspect of our daily lives. 这种变化带来了便利，也带来了新的挑战——比如隐私问题和信息安全。"
    "Elon Musk 的公司 SpaceX 正在探索如何通过技术改变人类的未来。",
    "旅行是扩展视野的最佳方式之一。Exploring new destinations allows you to experience different "
    "cultures and meet new people. 每一次旅行都是一次成长的机会，让你对世界有更深的理解——这种经历是无价的。"
    "Jules Verne 的《Around the World in Eighty Days》描述了旅行的奇妙冒险。",
    "健康的生活方式包括均衡的饮食和规律的锻炼。Eating a variety of nutritious foods and staying "
    "active can significantly improve your overall well-being. 健康不仅仅是身体的健康，还有心理的健康——"
    "两者同样重要。Dr. Robert Atkins 的《Atkins Diet》提供了一种特殊的饮食方法。",
    "艺术是表达情感的一种方式。Whether it's painting, music, or dance, art allows individuals to "
    "convey their deepest thoughts and feelings. 通过艺术，人们可以找到一种独特的表达方式——这是一种心灵的释放。"
    "Vincent van Gogh 的作品《Starry Night》是艺术表达的经典之作。",
    "教育是社会进步的基石。Quality education provides individuals with the knowledge and skills "
    "they need to succeed in life. 一个良好的教育体系可以提高国家的竞争力和创新能力——这对未来至关重要。"
    "Malala Yousafzai 在《I Am Malala》中呼吁全球教育平等。",
    "环境保护是我们共同的责任。Protecting our planet is crucial for the survival of future "
    "generations. 我们应该采取积极的行动来减少污染和保护自然资源——这不仅仅是为了我们自己。"
    "Rachel Carson 的《Silent Spring》揭示了环境保护的重要性。",
    "经济的发展离不开创新和创业。Entrepreneurship drives economic growth by creating new jobs and "
    "industries. 一个鼓励创新的环境可以激发更多人的创造力和潜力——从而促进社会的繁荣。"
    "Steve Jobs 创立的 Apple 公司就是创新驱动经济的典范。",
    "家庭是每个人最温暖的港湾。No matter how far you go, home is always where the heart is. "
    "家庭成员之间的支持和关爱是我们克服困难的最大动力——这种力量是无与伦比的。"
    "J.K. Rowling 的《Harry Potter》系列中强调了家庭和友谊的力量。",
]


def tokenizer_test_zh_en_rows():
    return [{"doc_id": i, "col1": TOKENIZER_TEST_ZH_EN[i]} for i in range(10)]
