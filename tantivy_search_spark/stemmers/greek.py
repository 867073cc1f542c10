"""Snowball Greek stemmer, implemented from the published algorithm
description (snowballstem.org "The Greek stemming algorithm";
G. Ntais, "Development of a Greek stemmer", with the Saroukos
refinements) — the algorithm behind tantivy's
Stemmer(Language::Greek)
(/root/reference/src/tokenizer/parser.rs:134-150 via rust-stemmers).

The algorithm works on upper-cased, accent-stripped Greek and runs a
fixed sequence of suffix rules; most rules carry an exception list of
stems that take back a shorter ending.  The rule/suffix structure
below is transcribed from the description; the per-rule exception
lists are reduced to their most frequent members (the full published
lists run to several hundred rare stems), which is recorded in
COVERAGE.md.  Output is lower-cased, final sigma normalized, like the
generated stemmer's behavior under a lowercasing token filter.
"""

from __future__ import annotations

import unicodedata

_VOWELS = set("ΑΕΗΙΟΥΩ")


def _normalize(word: str) -> str:
    """Uppercase and strip accents/diaeresis; map final sigma."""
    w = word.upper()
    out = []
    for ch in unicodedata.normalize("NFD", w):
        if unicodedata.combining(ch):
            continue
        out.append("Σ" if ch == "ς" else ch)
    return "".join(out)


def _ends_with_vowel(w: str) -> bool:
    return bool(w) and w[-1] in _VOWELS


#: step 1 irregular nouns: full-suffix -> replacement
_STEP1 = {
    "ΦΑΓΙΑ": "ΦΑ", "ΦΑΓΙΟΥ": "ΦΑ", "ΦΑΓΙΩΝ": "ΦΑ",
    "ΣΚΑΓΙΑ": "ΣΚΑ", "ΣΚΑΓΙΟΥ": "ΣΚΑ", "ΣΚΑΓΙΩΝ": "ΣΚΑ",
    "ΟΛΟΓΙΟΥ": "ΟΛΟ", "ΟΛΟΓΙΑ": "ΟΛΟ", "ΟΛΟΓΙΩΝ": "ΟΛΟ",
    "ΣΟΓΙΟΥ": "ΣΟ", "ΣΟΓΙΑ": "ΣΟ", "ΣΟΓΙΩΝ": "ΣΟ",
    "ΤΑΤΟΓΙΑ": "ΤΑΤΟ", "ΤΑΤΟΓΙΟΥ": "ΤΑΤΟ", "ΤΑΤΟΓΙΩΝ": "ΤΑΤΟ",
    "ΚΡΕΑΣ": "ΚΡΕ", "ΚΡΕΑΤΟΣ": "ΚΡΕ", "ΚΡΕΑΤΑ": "ΚΡΕ",
    "ΚΡΕΑΤΩΝ": "ΚΡΕ",
    "ΠΕΡΑΣ": "ΠΕΡ", "ΠΕΡΑΤΟΣ": "ΠΕΡ", "ΠΕΡΑΤΑ": "ΠΕΡ",
    "ΠΕΡΑΤΩΝ": "ΠΕΡ",
    "ΤΕΡΑΣ": "ΤΕΡ", "ΤΕΡΑΤΟΣ": "ΤΕΡ", "ΤΕΡΑΤΑ": "ΤΕΡ",
    "ΤΕΡΑΤΩΝ": "ΤΕΡ",
    "ΦΩΣ": "ΦΩ", "ΦΩΤΟΣ": "ΦΩ", "ΦΩΤΑ": "ΦΩ", "ΦΩΤΩΝ": "ΦΩ",
    "ΚΑΘΕΣΤΩΣ": "ΚΑΘΕΣΤ", "ΚΑΘΕΣΤΩΤΟΣ": "ΚΑΘΕΣΤ",
    "ΚΑΘΕΣΤΩΤΑ": "ΚΑΘΕΣΤ", "ΚΑΘΕΣΤΩΤΩΝ": "ΚΑΘΕΣΤ",
    "ΓΕΓΟΝΟΣ": "ΓΕΓΟΝ", "ΓΕΓΟΝΟΤΟΣ": "ΓΕΓΟΝ",
    "ΓΕΓΟΝΟΤΑ": "ΓΕΓΟΝ", "ΓΕΓΟΝΟΤΩΝ": "ΓΕΓΟΝ",
}

def _table(sufs):
    return sorted(sufs, key=len, reverse=True)


def stem(word: str) -> str:
    w = _normalize(word)
    if len(w) < 3 or not all(
            "Α" <= c <= "Ω" or c in "ΪΫ" for c in w):
        return word.lower()

    stemmed = False

    # step 1: irregular nouns
    for suf in _table(_STEP1):
        if w.endswith(suf):
            w = w[: -len(suf)] + _STEP1[suf]
            stemmed = True
            break

    # step 2a: -ΑΔΕΣ/-ΑΔΩΝ (plural of -ΑΣ nouns)
    for suf in ("ΑΔΕΣ", "ΑΔΩΝ"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            if not any(w.endswith(s) for s in
                       ("ΟΚ", "ΜΑΜ", "ΜΑΝ", "ΜΠΑΜΠ", "ΠΑΤΕΡ",
                        "ΓΙΑΓΙ", "ΝΤΑΝΤ", "ΚΥΡ", "ΘΕΙ", "ΠΕΘΕΡ")):
                pass
            else:
                w += "ΑΔ"
            break
    # step 2b: -ΕΔΕΣ/-ΕΔΩΝ
    for suf in ("ΕΔΕΣ", "ΕΔΩΝ"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            if any(w.endswith(s) for s in
                   ("ΟΠ", "ΙΠ", "ΕΜΠ", "ΥΠ", "ΓΗΠ", "ΔΑΠ", "ΚΡΑΣΠ",
                    "ΜΙΛ")):
                w += "ΕΔ"
            break
    # step 2c: -ΟΥΔΕΣ/-ΟΥΔΩΝ
    for suf in ("ΟΥΔΕΣ", "ΟΥΔΩΝ"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            if any(w.endswith(s) for s in
                   ("ΑΡΚ", "ΚΑΛΙΑΚ", "ΠΕΤΑΛ", "ΛΙΧ", "ΠΛΕΞ", "ΣΚ",
                    "Σ", "ΦΛ", "ΦΡ", "ΒΕΛ", "ΛΟΥΛ", "ΧΝ", "ΣΠ",
                    "ΤΡΑΓ", "ΦΕ")):
                w += "ΟΥΔ"
            break
    # step 2d: -ΕΩΣ/-ΕΩΝ (nouns in -Η/-ΕΙΣ)
    for suf in ("ΕΩΣ", "ΕΩΝ"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            stemmed = True
            if w in ("Θ", "Δ", "ΕΛ", "ΓΑΛ", "Ν", "Π", "ΙΔ", "ΠΑΡ"):
                w += "Ε"
            break

    # step 3: -ΙΑ/-ΙΟΥ/-ΙΩΝ after vowel -> keep Ι
    for suf in ("ΙΑ", "ΙΟΥ", "ΙΩΝ"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            stemmed = True
            if _ends_with_vowel(w):
                w += "Ι"
            break

    # step 4: -ΙΚΑ/-ΙΚΟ/-ΙΚΟΥ/-ΙΚΩΝ adjectives
    for suf in ("ΙΚΑ", "ΙΚΟ", "ΙΚΟΥ", "ΙΚΩΝ"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            stemmed = True
            if _ends_with_vowel(w) or w in (
                    "ΑΛ", "ΑΔ", "ΕΝΔ", "ΑΜΑΝ", "ΑΜΜΟΧΑΛ", "ΗΘ",
                    "ΑΝΗΘ", "ΑΝΤΙΔ", "ΦΥΣ", "ΒΡΩΜ", "ΓΕΡ", "ΕΞΩΔ",
                    "ΚΑΛΠ", "ΚΑΛΛΙΝ", "ΚΑΤΑΔ", "ΜΟΥΛ", "ΜΠΑΝ",
                    "ΜΠΑΓΙΑΤ", "ΜΠΟΛ", "ΜΠΟΣ", "ΝΙΤ", "ΞΙΚ",
                    "ΣΥΝΟΜΗΛ", "ΠΕΤΣ", "ΠΙΤΣ", "ΠΙΚΑΝΤ", "ΠΛΙΑΤΣ",
                    "ΠΟΣΤΕΛΝ", "ΠΡΩΤΟΔ", "ΣΕΡΤ", "ΣΥΝΑΔ", "ΤΣΑΜ",
                    "ΥΠΟΔ", "ΦΙΛΟΝ", "ΦΥΛΟΔ", "ΧΑΣ"):
                w += "ΙΚ"
            break

    # step 5a: ΑΓΑΜΕ/ΗΣΑΜΕ/ΟΥΣΑΜΕ/ΗΚΑΜΕ/ΑΜΕ (1pl past)
    for suf in ("ΗΘΗΚΑΜΕ", "ΑΓΑΜΕ", "ΗΣΑΜΕ", "ΟΥΣΑΜΕ", "ΗΚΑΜΕ"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            stemmed = True
            break
    else:
        if w.endswith("ΑΜΕ"):
            w = w[:-3]
            stemmed = True
            if w in ("ΑΝΑΠ", "ΑΠΟΘ", "ΑΠΟΚ", "ΑΠΟΣΤ", "ΒΟΥΒ",
                     "ΞΕΘ", "ΟΥΛ", "ΠΕΘ", "ΠΙΚΡ", "ΠΟΤ", "ΣΙΧ", "Χ"):
                w += "ΑΜ"

    # step 5b: ΑΓΑΝΕ/ΗΣΑΝΕ/ΟΥΣΑΝΕ/ΙΟΝΤΑΝΕ.../ΑΝΕ (3pl past)
    for suf in ("ΗΘΗΚΑΝΕ", "ΑΓΑΝΕ", "ΗΣΑΝΕ", "ΟΥΣΑΝΕ", "ΙΟΝΤΑΝΕ",
                "ΙΟΤΑΝΕ", "ΙΟΥΝΤΑΝΕ", "ΟΝΤΑΝΕ", "ΟΤΑΝΕ",
                "ΟΥΝΤΑΝΕ", "ΗΚΑΝΕ"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            stemmed = True
            if w in ("ΤΡ", "ΤΣ"):
                w += "ΑΓΑΝ"
            break
    else:
        if w.endswith("ΑΝΕ"):
            w = w[:-3]
            stemmed = True
            if w in ("ΒΕΤΕΡ", "ΒΟΥΛΚ", "ΒΡΑΧΜ", "Γ", "ΔΡΑΔΟΥΜ",
                     "Θ", "ΚΑΛΠΟΥΖ", "ΚΑΣΤΕΛ", "ΚΟΡΜΟΡ", "ΛΑΟΠΛ",
                     "ΜΩΑΜΕΘ", "Μ", "ΜΟΥΣΟΥΛΜ", "Ν", "ΟΥΛ", "Π",
                     "ΠΕΛΕΚ", "ΠΛ", "ΠΟΛΙΣ", "ΠΟΡΤΟΛ", "ΣΑΡΑΚΑΤΣ",
                     "ΣΟΥΛΤ", "ΤΣΑΡΛΑΤ", "ΟΡΦ", "ΤΣΙΓΓ", "ΤΣΟΠ",
                     "ΦΩΤΟΣΤΕΦ", "Χ", "ΨΥΧΟΠΛ", "ΑΓ", "ΟΡΦ", "ΓΑΛ",
                     "ΓΕΡ", "ΔΕΚ", "ΔΙΠΛ", "ΑΜΕΡΙΚΑΝ", "ΟΥΡ", "ΠΙΘ",
                     "ΠΟΥΡΙΤ", "Σ", "ΖΩΝΤ", "ΙΚ", "ΚΑΣΤ", "ΚΟΠ",
                     "ΛΙΧ", "ΛΟΥΘΗΡ", "ΜΑΙΝΤ", "ΜΕΛ", "ΣΙΓ", "ΣΠ",
                     "ΣΤΕΓ", "ΤΡΑΓ", "ΤΣΑΓ", "Φ", "ΕΡ", "ΑΔΑΠ",
                     "ΑΘΙΓΓ", "ΑΜΗΧ", "ΑΝΙΚ", "ΑΝΟΡΓ", "ΑΠΗΓ",
                     "ΑΠΙΘ", "ΑΤΣΙΓΓ", "ΒΑΣ", "ΒΑΣΚ", "ΒΑΘΥΓΑΛ",
                     "ΒΙΟΜΗΧ", "ΒΡΑΧΥΚ", "ΔΙΑΤ", "ΔΙΑΦ", "ΕΝΟΡΓ",
                     "ΘΥΣ", "ΚΑΠΝΟΒΙΟΜΗΧ", "ΚΑΤΑΓΑΛ", "ΚΛΙΒ",
                     "ΚΟΙΛΑΡΦ", "ΛΙΒ", "ΜΕΓΛΟΒΙΟΜΗΧ", "ΜΙΚΡΟΒΙΟΜΗΧ",
                     "ΝΤΑΒ", "ΞΗΡΟΚΛΙΒ", "ΟΛΙΓΟΔΑΜ", "ΟΛΟΓΑΛ",
                     "ΠΕΝΤΑΡΦ", "ΠΕΡΗΦ", "ΠΕΡΙΤΡ", "ΠΛΑΤ",
                     "ΠΟΛΥΔΑΠ", "ΠΟΛΥΜΗΧ", "ΣΤΕΦ", "ΤΑΒ",
                     "ΤΕΤ", "ΥΠΕΡΗΦ", "ΥΠΟΚΟΠ", "ΧΑΜΗΛΟΔΑΠ",
                     "ΨΗΛΟΤΑΒ"):
                w += "ΑΝ"

    # step 5c: ΗΣΕΤΕ / ΕΤΕ (2pl)
    if w.endswith("ΗΣΕΤΕ"):
        w = w[:-5]
        stemmed = True
    elif w.endswith("ΕΤΕ"):
        w = w[:-3]
        stemmed = True
        if w[-2:] in ("ΟΔ", "ΑΙΡ", "ΦΟΡ", "ΤΑΘ", "ΔΙΑΘ", "ΣΧ",
                      "ΕΝΔ", "ΕΥΡ", "ΤΙΘ", "ΥΠΕΡΘ", "ΡΑΘ", "ΕΝΘ",
                      "ΡΟΘ", "ΣΘ", "ΠΥΡ", "ΑΙΝ", "ΣΥΝΔ", "ΣΥΝ",
                      "ΣΥΝΘ", "ΧΩΡ", "ΠΟΝ", "ΒΡ", "ΚΑΘ", "ΕΥΘ",
                      "ΕΚΘ", "ΝΕΤ", "ΡΟΝ", "ΑΡΚ", "ΒΑΡ", "ΒΟΛ",
                      "ΩΦΕΛ") or w in ("ΑΒΑΡ", "ΒΕΝ", "ΕΝΑΡ",
                                       "ΑΒΡ", "ΑΔ", "ΑΘ", "ΑΝ",
                                       "ΑΠΛ", "ΒΑΡΟΝ", "ΝΤΡ", "ΣΚ",
                                       "ΚΟΠ", "ΜΠΟΡ", "ΝΙΦ", "ΠΑΓ",
                                       "ΠΟΛ", "ΣΕΡΠ", "ΣΚΕΛ",
                                       "ΣΥΡΦ", "ΤΟΚ", "Υ", "Δ",
                                       "ΕΜ", "ΘΑΡΡ", "Θ"):
            w += "ΕΤ"

    # step 5d: ΟΝΤΑΣ/ΩΝΤΑΣ (gerund)
    for suf in ("ΟΝΤΑΣ", "ΩΝΤΑΣ"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            stemmed = True
            if w == "ΑΡΧ":
                w += "ΟΝΤ"
            if w.endswith("ΚΡΕ"):
                w += "ΩΝΤ"
            break
    # step 5e: ΟΜΑΣΤΕ/ΙΟΜΑΣΤΕ
    for suf in ("ΙΟΜΑΣΤΕ", "ΟΜΑΣΤΕ"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            stemmed = True
            if w == "ΟΝ":
                w += "ΟΜΑΣΤ"
            break
    # step 5f: ΙΕΣΤΕ/ΕΣΤΕ
    if w.endswith("ΙΕΣΤΕ"):
        w = w[:-5]
        stemmed = True
        if w in ("Π", "ΑΠ", "ΣΥΜΠ", "ΑΣΥΜΠ", "ΑΚΑΤΑΠ", "ΑΜΕΤΑΜΦ"):
            w += "ΙΕΣΤ"
    elif w.endswith("ΕΣΤΕ"):
        w = w[:-4]
        stemmed = True
        if w in ("ΑΛ", "ΑΡ", "ΕΚΤΕΛ", "Ζ", "Μ", "Ξ", "ΠΑΡΑΚΑΛ",
                 "ΠΡΟ", "ΝΙΣ"):
            w += "ΕΣΤ"
    # step 5g: ΗΘΗΚΑ/ΗΘΗΚΕΣ/ΗΘΗΚΕ then ΗΚΑ/ΗΚΕΣ/ΗΚΕ
    for suf in ("ΗΘΗΚΑ", "ΗΘΗΚΕΣ", "ΗΘΗΚΕ"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            stemmed = True
            break
    else:
        for suf in ("ΗΚΑ", "ΗΚΕΣ", "ΗΚΕ"):
            if w.endswith(suf):
                w = w[: -len(suf)]
                stemmed = True
                if w.endswith(("ΣΚΩΛ", "ΣΚΟΥΛ", "ΝΑΡΘ", "ΣΦ", "ΟΘ",
                               "ΠΙΘ")) or w in ("ΔΙΑΘ", "Θ", "ΠΑΡΑΚΑΤΑΘ",
                                                "ΠΡΟΣΘ", "ΣΥΝΘ"):
                    w += "ΗΚ"
                break
    # step 5h: ΟΥΣΑ/ΟΥΣΕΣ/ΟΥΣΕ
    for suf in ("ΟΥΣΑ", "ΟΥΣΕΣ", "ΟΥΣΕ"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            stemmed = True
            if w.endswith(("ΠΟΔΑΡ", "ΒΛΕΠ", "ΠΑΝΤΑΧ", "ΦΡΥΔ",
                           "ΜΑΝΤΙΛ", "ΜΑΛΛ", "ΚΥΜΑΤ", "ΛΑΧ", "ΛΗΓ",
                           "ΦΑΓ", "ΟΜ", "ΠΡΩΤ")) or w in (
                    "ΦΑΡΜΑΚ", "ΧΑΔ", "ΑΓΚ", "ΑΝΑΡΡ", "ΒΡΟΜ", "ΕΚΛΙΠ",
                    "ΛΑΜΠΙΔ", "ΛΕΧ", "Μ", "ΠΑΤ", "Ρ", "Λ", "ΜΕΔ",
                    "ΜΕΣΑΖ", "ΥΠΟΤΕΙΝ", "ΑΜ", "ΑΙΘ", "ΑΝΗΚ",
                    "ΔΕΣΠΟΖ", "ΕΝΔΙΑΦΕΡ"):
                w += "ΟΥΣ"
            break
    # step 5i: ΑΓΑ/ΑΓΕΣ/ΑΓΕ
    for suf in ("ΑΓΑ", "ΑΓΕΣ", "ΑΓΕ"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            stemmed = True
            if w.endswith(("ΟΦ", "ΠΕΛ", "ΧΟΡΤ", "ΛΛ", "ΣΦ", "ΡΠ",
                           "ΦΡ", "ΠΡ", "ΛΟΧ", "ΣΜΗΝ")) or w in (
                    "ΨΟΦ", "ΝΑΥΛΟΧ", "ΑΒΑΣΤ", "ΠΟΛΥΦ", "ΑΔΗΦ",
                    "ΠΑΜΦ", "Ρ", "ΑΣΠ", "ΑΦ", "ΑΜΑΛ", "ΑΜΑΛΛΙ",
                    "ΑΝΥΣΤ", "ΑΠΕΡ", "ΑΣΠΑΡ", "ΑΧΑΡ", "ΔΕΡΒΕΝ",
                    "ΔΡΟΣΟΠ", "ΞΕΦ", "ΝΕΟΠ", "ΝΟΜΟΤ", "ΟΛΟΠ",
                    "ΟΜΟΤ", "ΠΡΟΣΤ", "ΠΡΟΣΩΠΟΠ", "ΣΥΜΠ", "ΣΥΝΤ",
                    "Τ", "ΥΠΟΤ", "ΧΑΡ", "ΑΕΙΠ", "ΑΙΜΟΣΤ", "ΑΝΥΠ",
                    "ΑΠΟΤ", "ΑΡΤΙΠ", "ΔΙΑΤ", "ΕΝ", "ΕΠΙΤ",
                    "ΚΡΟΚΑΛΟΠ", "ΣΙΔΗΡΟΠ", "Λ", "ΝΑΥ", "ΟΥΛΑΜ",
                    "ΟΥΡ", "Π", "ΤΡ", "Μ"):
                w += "ΑΓ"
            break
    # step 5j: ΗΣΕ/ΗΣΟΥ/ΗΣΑ
    for suf in ("ΗΣΕ", "ΗΣΟΥ", "ΗΣΑ"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            stemmed = True
            if w in ("Ν", "ΧΕΡΣΟΝ", "ΔΩΔΕΚΑΝ", "ΕΡΗΜΟΝ", "ΜΕΓΑΛΟΝ",
                     "ΕΠΤΑΝ", "ΑΓΑΘΟΝ"):
                w += "ΗΣ"
            break
    # step 5k: ΗΣΤΕ
    if w.endswith("ΗΣΤΕ"):
        w = w[:-4]
        stemmed = True
        if w in ("ΑΣΒ", "ΣΒ", "ΑΧΡ", "ΧΡ", "ΑΠΛ", "ΑΕΙΜΝ",
                 "ΔΥΣΧΡ", "ΕΥΧΡ", "ΚΟΙΝΟΧΡ", "ΠΑΛΙΜΨ"):
            w += "ΗΣΤ"
    # step 5l: ΟΥΝΕ/ΗΣΟΥΝΕ/ΗΘΟΥΝΕ
    for suf in ("ΗΣΟΥΝΕ", "ΗΘΟΥΝΕ", "ΟΥΝΕ"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            stemmed = True
            if w in ("Ν", "Ρ", "ΣΠΙ", "ΣΤΡΑΒΟΜΟΥΤΣ", "ΚΑΚΟΜΟΥΤΣ",
                     "ΕΞΩΝ"):
                w += "ΟΥΝ"
            break
    # step 5m: ΟΥΜΕ/ΗΣΟΥΜΕ/ΗΘΟΥΜΕ
    for suf in ("ΗΣΟΥΜΕ", "ΗΘΟΥΜΕ", "ΟΥΜΕ"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            stemmed = True
            if w in ("ΠΑΡΑΣΟΥΣ", "Φ", "Χ", "ΩΡΙΟΠΛ", "ΑΖ",
                     "ΑΛΛΟΣΟΥΣ", "ΑΣΟΥΣ"):
                w += "ΟΥΜ"
            break

    # step 6: common noun/adjective/verb endings
    for suf in _table((
            "ΜΑΤΟΙ", "ΜΑΤΟΥΣ", "ΜΑΤΟ", "ΜΑΤΑ", "ΜΑΤΩΣ", "ΜΑΤΩΝ",
            "ΜΑΤΟΣ", "ΜΑΤΕΣ", "ΜΑΤΗ", "ΜΑΤΗΣ", "ΜΑΤΟΥ")):
        if w.endswith(suf):
            w = w[: -len(suf)] + "ΜΑ"
            stemmed = True
            break
    for suf in _table((
            "Α", "ΑΓΑΤΕ", "ΑΓΑΝ", "ΑΕΙ", "ΑΜΑΙ", "ΑΝ", "ΑΣ",
            "ΑΣΑΙ", "ΑΤΑΙ", "ΑΩ", "Ε", "ΕΙ", "ΕΙΣ", "ΕΙΤΕ",
            "ΕΣΑΙ", "ΕΣ", "ΕΤΑΙ", "Ι", "ΙΕΜΑΙ", "ΙΕΜΑΣΤΕ",
            "ΙΕΤΑΙ", "ΙΕΣΑΙ", "ΙΟΜΑΣΤΑΝ", "ΙΟΜΟΥΝ", "ΙΟΜΟΥΝΑ",
            "ΙΟΝΤΑΝ", "ΙΟΝΤΟΥΣΑΝ", "ΙΟΣΑΣΤΑΝ", "ΙΟΣΑΣΤΕ",
            "ΙΟΣΟΥΝ", "ΙΟΣΟΥΝΑ", "ΙΟΤΑΝ", "ΙΟΥΜΑ", "ΙΟΥΜΑΣΤΕ",
            "ΙΟΥΝΤΑΙ", "ΙΟΥΝΤΑΝ", "Η", "ΗΔΕΣ", "ΗΔΩΝ", "ΗΘΕΙ",
            "ΗΘΕΙΣ", "ΗΘΕΙΤΕ", "ΗΘΗΚΑΤΕ", "ΗΘΗΚΑΝ", "ΗΘΟΥΝ",
            "ΗΘΩ", "ΗΚΑΤΕ", "ΗΚΑΝ", "ΗΣ", "ΗΣΑΝ", "ΗΣΑΤΕ",
            "ΗΣΕΙ", "ΗΣΕΣ", "ΗΣΟΥΝ", "ΗΣΩ", "Ο", "ΟΙ", "ΟΜΑΙ",
            "ΟΜΑΣΤΑΝ", "ΟΜΟΥΝ", "ΟΜΟΥΝΑ", "ΟΝΤΑΙ", "ΟΝΤΑΝ",
            "ΟΝΤΟΥΣΑΝ", "ΟΣ", "ΟΣΑΣΤΑΝ", "ΟΣΑΣΤΕ", "ΟΣΟΥΝ",
            "ΟΣΟΥΝΑ", "ΟΤΑΝ", "ΟΥ", "ΟΥΜΑΙ", "ΟΥΜΑΣΤΕ", "ΟΥΝ",
            "ΟΥΝΤΑΙ", "ΟΥΝΤΑΝ", "ΟΥΣ", "ΟΥΣΑΝ", "ΟΥΣΑΤΕ", "Υ",
            "ΥΣ", "Ω", "ΩΝ")):
        if w.endswith(suf):
            w = w[: -len(suf)]
            stemmed = True
            break

    # step 7: superlative endings
    for suf in ("ΕΣΤΕΡ", "ΕΣΤΑΤ", "ΟΤΕΡ", "ΟΤΑΤ", "ΥΤΕΡ", "ΥΤΑΤ",
                "ΩΤΕΡ", "ΩΤΑΤ"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    return w.lower()
