"""Bundled stop-word lists for the 13 languages the reference accepts
(/root/reference/src/tokenizer/languages.rs:28-40 maps them to
tantivy's per-language stop-word sets, which are generated from the
public Snowball project stop-word lists).

These are transcriptions of those public Snowball lists (the same
family Lucene bundles).  English is the exact 33-word Lucene/Tantivy
list.  The function-word cores match the reference behaviorally — its
own tokenizer tests only assert that common function words ("the",
"auf", ...) are filtered (parser.rs:324-347).
"""

from __future__ import annotations

ENGLISH = frozenset(
    """a an and are as at be but by for if in into is it no not of on or
    such that the their then there these they this to was will with""".split()
)

FRENCH = frozenset("""
au aux avec ce ces dans de des du elle en et eux il ils je la le les leur
lui ma mais me même mes moi mon ne nos notre nous on ou par pas pour qu
que qui sa se ses son sur ta te tes toi ton tu un une vos votre vous
c d j l à m n s t y
été étée étées étés étant étante étants étantes suis es est sommes êtes
sont serai seras sera serons serez seront serais serait serions seriez
seraient étais était étions étiez étaient fus fut fûmes fûtes furent sois
soit soyons soyez soient fusse fusses fût fussions fussiez fussent ayant
ayante ayantes ayants eu eue eues eus ai as avons avez ont aurai auras
aura aurons aurez auront aurais aurait aurions auriez auraient avais
avait avions aviez avaient eut eûmes eûtes eurent aie aies ait ayons ayez
aient eusse eusses eût eussions eussiez eussent
""".split())

GERMAN = frozenset("""
aber alle allem allen aller alles als also am an ander andere anderem
anderen anderer anderes anderm andern anderr anders auch auf aus bei bin
bis bist da damit dann der den des dem die das dass derselbe derselben
denselben desselben demselben dieselbe dieselben dasselbe dazu dein deine
deinem deinen deiner deines denn derer dessen dich dir du dies diese
diesem diesen dieser dieses doch dort durch ein eine einem einen einer
eines einig einige einigem einigen einiger einiges einmal er ihn ihm es
etwas euer eure eurem euren eurer eures fuer gegen gewesen hab habe haben
hat hatte hatten hier hin hinter ich mich mir ihr ihre ihrem ihren ihrer
ihres euch im in indem ins ist jede jedem jeden jeder jedes jene jenem
jenen jener jenes jetzt kann kein keine keinem keinen keiner keines
koennen koennte machen man manche manchem manchen mancher manches mein
meine meinem meinen meiner meines mit muss musste nach nicht nichts noch
nun nur ob oder ohne sehr sein seine seinem seinen seiner seines selbst
sich sie ihnen sind so solche solchem solchen solcher solches soll sollte
sondern sonst ueber um und uns unse unsem unsen unser unses unter viel
vom von vor waehrend war waren warst was weg weil weiter welche welchem
welchen welcher welches wenn werde werden wie wieder will wir wird wirst
wo wollen wollte wuerde wuerden zu zum zur zwar zwischen
daß für können könnte müssen über während würde würden
""".split())

SPANISH = frozenset("""
de la que el en y a los del se las por un para con no una su al lo como
mas pero sus le ya o este si porque esta entre cuando muy sin sobre
tambien me hasta hay donde quien desde todo nos durante todos uno les ni
contra otros ese eso ante ellos e esto mi antes algunos que unos yo otro
otras otra el tanto esa estos mucho quienes nada muchos cual poco ella
estar estas algunas algo nosotros mis tu te ti tus ellas nosotras
vosotros vosotras os mio mia mios mias tuyo tuya tuyos tuyas suyo suya
suyos suyas nuestro nuestra nuestros nuestras vuestro vuestra vuestros
vuestras esos esas
estoy estas esta estamos estais estan este estes estemos esteis esten
estare estaras estara estaremos estareis estaran estaria estarias
estariamos estariais estarian estaba estabas estabamos estabais estaban
estuve estuviste estuvo estuvimos estuvisteis estuvieron estuviera
estuvieras estuvieramos estuvierais estuvieran estuviese estuvieses
estuviesemos estuvieseis estuviesen estando estado estada estados
estadas estad
he has ha hemos habeis han haya hayas hayamos hayais hayan habre habras
habra habremos habreis habran habria habrias habriamos habriais habrian
habia habias habiamos habiais habian hube hubiste hubo hubimos hubisteis
hubieron hubiera hubieras hubieramos hubierais hubieran hubiese hubieses
hubiesemos hubieseis hubiesen habiendo habido habida habidos habidas
soy eres es somos sois son sea seas seamos seais sean sere seras sera
seremos sereis seran seria serias seriamos seriais serian era eras eramos
erais eran fui fuiste fue fuimos fuisteis fueron fuera fueras fueramos
fuerais fueran fuese fueses fuesemos fueseis fuesen siendo sido
tengo tienes tiene tenemos teneis tienen tenga tengas tengamos tengais
tengan tendre tendras tendra tendremos tendreis tendran tendria tendrias
tendriamos tendriais tendrian tenia tenias teniamos teniais tenian tuve
tuviste tuvo tuvimos tuvisteis tuvieron tuviera tuvieras tuvieramos
tuvierais tuvieran tuviese tuvieses tuviesemos tuvieseis tuviesen
teniendo tenido tenida tenidos tenidas tened
más también sí está están él mí qué
""".split())

ITALIAN = frozenset("""
ad al allo ai agli all agl alla alle con col coi da dal dallo dai dagli
dall dagl dalla dalle di del dello dei degli dell degl della delle in nel
nello nei negli nell negl nella nelle su sul sullo sui sugli sull sugl
sulla sulle per tra contro io tu lui lei noi voi loro mio mia miei mie
tuo tua tuoi tue suo sua suoi sue nostro nostra nostri nostre vostro
vostra vostri vostre mi ti ci vi lo la li le gli ne il un uno una ma ed
se perche anche come dov dove che chi cui non piu quale quanto quanti
quanta quante quello quelli quella quelle questo questi questa queste si
tutto tutti a c e i l o ho hai ha abbiamo avete hanno abbia abbiate
abbiano avro avrai avra avremo avrete avranno avrei avresti avrebbe
avremmo avreste avrebbero avevo avevi aveva avevamo avevate avevano ebbi
avesti ebbe avemmo aveste ebbero avessi avesse avessimo avessero avendo
avuto avuta avuti avute sono sei e siamo siete sia siate siano saro sarai
sara saremo sarete saranno sarei saresti sarebbe saremmo sareste
sarebbero ero eri era eravamo eravate erano fui fosti fu fummo foste
furono fossi fosse fossimo fossero essendo faccio fai facciamo fanno
faccia facciate facciano faro farai fara faremo farete faranno farei
faresti farebbe faremmo fareste farebbero facevo facevi faceva facevamo
facevate facevano feci facesti fece facemmo faceste fecero facessi
facesse facessimo facessero facendo sto stai sta stiamo stanno stia
stiate stiano staro starai stara staremo starete staranno starei staresti
starebbe staremmo stareste starebbero stavo stavi stava stavamo stavate
stavano stetti stesti stette stemmo steste stettero stessi stesse
stessimo stessero stando perché più
""".split())

PORTUGUESE = frozenset("""
de a o que e do da em um para com nao uma os no se na por mais as dos
como mas ao ele das a seu sua ou quando muito nos ja eu tambem so pelo
pela ate isso ela entre depois sem mesmo aos seus quem nas me esse eles
voce essa num nem suas meu as minha numa pelos elas qual nos lhe deles
essas esses pelas este dele tu te voces vos lhes meus minhas teu tua teus
tuas nosso nossa nossos nossas dela delas esta estes estas aquele aquela
aqueles aquelas isto aquilo estou esta estamos estao estive esteve
estivemos estiveram estava estavamos estavam estivera estiveramos esteja
estejamos estejam estivesse estivessemos estivessem estiver estivermos
estiverem hei ha havemos hao houve houvemos houveram houvera houveramos
haja hajamos hajam houvesse houvessemos houvessem houver houvermos
houverem houverei houvera houveremos houverao houveria houveriamos
houveriam sou somos sao era eramos eram fui foi fomos foram fora foramos
seja sejamos sejam fosse fossemos fossem for formos forem serei sera
seremos serao seria seriamos seriam tenho tem temos tem tinha tinhamos
tinham tive teve tivemos tiveram tivera tiveramos tenha tenhamos tenham
tivesse tivessemos tivessem tiver tivermos tiverem terei tera teremos
terao teria teriamos teriam
não já até você é são está
""".split())

DUTCH = frozenset("""
de en van ik te dat die in een hij het niet zijn is was op aan met als
voor had er maar om hem dan zou of wat mijn men dit zo door over ze zich
bij ook tot je mij uit der daar haar naar heb hoe heeft hebben deze u
want nog zal me zij nu ge geen omdat iets worden toch al waren veel meer
doen toen moet ben zonder kan hun dus alles onder ja eens hier wie werd
altijd doch wordt wezen kunnen ons zelf tegen na reeds wil kon niets uw
iemand geweest andere
""".split())

DANISH = frozenset("""
og i jeg det at en den til er som pa de med han af for ikke der var mig
sig men et har om vi min havde ham hun nu over da fra du ud sin dem os
op man hans hvor eller hvad skal selv her alle vil blev kunne ind nar
vaere dog noget ville jo deres efter ned skulle denne end dette mit ogsa
under have dig anden hende mine alt meget sit sine vor mod disse hvis
din nogle hos blive mange ad bliver hendes vaeret thi jer sadan
på når være også sådan
""".split())

NORWEGIAN = frozenset("""
og i jeg det at en et den til er som pa de med han av ikke ikkje der sa
var meg seg men ett har om vi min mitt ha hadde hun na over da ved fra
du ut sin dem oss opp man kan hans hvor eller hva skal selv sjol her
alle vil bli ble blei bli blitt kunne inn nar vaere kom noen noe ville
dere som deres kun ja etter ned skulle denne for deg si sine sitt mot a
meget hvorfor dette disse uten hvordan ingen din ditt blir samme hvilken
hvilke sann inni mellom var hver hvem vors hvis bade bare enn fordi fr
ikkje so somt att inkje korleis korso kva kvarhelst kven kvi kvifor me
medan mi mine mykje no nokon noka nokor noko nokre si sia sidan so somme
um upp vere vore verte vort varte vart
på så nå være å sånn både
""".split())

SWEDISH = frozenset("""
och det att i en jag hon som han pa den med var sig for sa till ar men
ett om hade de av icke mig du henne da sin nu har inte hans honom skulle
hennes dar min man ej vid kunde nagot fran ut nar efter upp vi dem vara
vad over an dig kan sina har ha mot alla under nagon eller allt mycket
sedan ju denna sjalv detta at darfor sadan vart dina vars vart varje var
er era vilket och om oss hur sitta ni
på för så är då där när något från än sådan själv därför vårt våra ert
""".split())

FINNISH = frozenset("""
olla olen olet on olemme olette ovat ole oli olisi olisit olisin
olisimme olisitte olisivat olit olin olimme olitte olivat ollut olleet
en et ei emme ette eivat mina minun minut minua minussa minusta minuun
minulla minulta minulle sina sinun sinut sinua sinussa sinusta sinuun
sinulla sinulta sinulle han hanen hanet hanta hanessa hanesta haneen
hanella hanelta hanelle me meidan meidat meita meissa meista meihin
meilla meilta meille te teidan teidat teita teissa teista teihin teilla
teilta teille he heidan heidat heita heissa heista heihin heilla heilta
heille tama taman tata tassa tasta tahan talla talta talle tana taksi
tuo tuon tuota tuossa tuosta tuohon tuolla tuolta tuolle tuona tuoksi
se sen sita siina siita siihen silla silta sille sina siksi nama naiden
naita naissa naista naihin nailla nailta naille naina naiksi nuo noiden
noita noissa noista noihin noilla noilta noille noina noiksi ne niiden
niita niissa niista niihin niilla niilta niille niina niiksi kuka kenen
kenet keta kenessa kenesta keneen kenella kenelta kenelle kenena keneksi
ketka keiden ketka keita keissa keista keihin keilla keilta keille keina
keiksi mika minka minka mita missa mista mihin milla milta mille mina
miksi mitka joka jonka jota jossa josta johon jolla jolta jolle jona
joksi jotka joiden joita joissa joista joihin joilla joilta joille joina
joiksi etta ja jos koska kuin mutta niin seka sitten tai vaan vai vaikka
kanssa mukaan noin poikki yli kun niin nyt itse
että eivät minä sinä hän tämä mikä
""".split())

HUNGARIAN = frozenset("""
a ahogy ahol aki akik akkor alatt altal altalaban amely amelyek
amelyekben amelyeket amelyet amelynek ami amit amolyan amig amikor at
abban ahhoz annak arra arrol az azok azon azt azzal azert aztan azutan
azonban bar be belul benne cikk cikkek cikkeket csak de e eddig egesz
egy egyes egyetlen egyeb egyik egyre ekkor el eleg ellen elo eloszor
elott elso en eppen ebben ehhez emilyen ennek erre ez ezt ezek ezen
ezzel ezert es fel felé hanem hiszen hogy hogyan igy illetve ill ilyen
ilyenkor ison ismet itt jo jol jobban kell kellett keresztul keszitett
kivul kozott kozul legalabb lehet lehetett legyen lenne lenni lesz lett
maga magat majd mar mas masik meg meg mellett mert mely melyek mi mit
mig mikor milyen minden mindent mindenki mindig mint mintha mivel most
nagy nagyobb nagyon ne nekem neki nem nehany nelkul nincs olyan ott
ossze o ok oket pedig persze ra s sajat sem semmi sok sokat sokkal
szamara szemben szerint szinte talan tehat teljes tovabb tovabba tobb
ugy ugyanis uj ujabb ujra utan utana utolso vagy vagyis valaki valami
valamint valo vagyok van vannak volt voltam voltak voltunk vissza vele
viszont volna
által és én így már más még mért mi ő ők úgy új
""".split())

RUSSIAN = frozenset("""
и в во не что он на я с со как а то все она так его но да ты к у же вы
за бы по только ее мне было вот от меня еще нет о из ему теперь когда
даже ну вдруг ли если уже или ни быть был него до вас нибудь опять уж
вам ведь там потом себя ничего ей может они тут где есть надо ней для мы
тебя их чем была сам чтоб без будто чего раз тоже себе под будет ж тогда
кто этот того потому этого какой совсем ним здесь этом один почти мой
тем чтобы нее сейчас были куда зачем всех никогда можно при наконец два
об другой хоть после над больше тот через эти нас про всего них какая
много разве три эту моя впрочем хорошо свою этой перед иногда лучше чуть
том нельзя такой им более всегда конечно всю между
""".split())

BY_LANGUAGE: dict[str, frozenset[str]] = {
    "danish": DANISH,
    "dutch": DUTCH,
    "english": ENGLISH,
    "finnish": FINNISH,
    "french": FRENCH,
    "german": GERMAN,
    "hungarian": HUNGARIAN,
    "italian": ITALIAN,
    "norwegian": NORWEGIAN,
    "portuguese": PORTUGUESE,
    "russian": RUSSIAN,
    "spanish": SPANISH,
    "swedish": SWEDISH,
}
