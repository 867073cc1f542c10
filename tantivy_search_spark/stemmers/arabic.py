"""Snowball Arabic stemmer, implemented from the published algorithm
description (snowballstem.org, "The Arabic stemming algorithm",
Assem Chelli) — the algorithm behind tantivy's
Stemmer(Language::Arabic)
(/root/reference/src/tokenizer/parser.rs:134-150 via rust-stemmers).

Phases, per the description:
1. normalization — strip tashkeel (U+064B..U+0652) and tatweel,
   fold the hamza-carrying alef forms into bare alef, split lam-alef
   ligatures;
2. Checks1 — a word opening with a definite article (ال/لل, or
   بال/كال with enough length) is marked noun+defined, never verb;
3. suffix stripping — object/possessive pronouns, verb conjugation
   endings, noun endings (ات، ة، ت ...), final alef-maqsura ى -> ي;
4. prefix stripping — conjunctions, the article, single-letter
   prepositions, with minimum-length guards throughout.

All length guards count characters of the normalized word at the
moment the rule applies, as in the spec.
"""

from __future__ import annotations

#: tashkeel (fathatan..sukun) + tatweel
_STRIP = set("ًٌٍَُِّْـ")

#: alef variants -> bare alef
_ALEF_FOLD = {"آ": "ا",  # alef madda  آ
              "أ": "ا",  # hamza above أ
              "إ": "ا",  # hamza below إ
              "ٱ": "ا"}  # alef wasla  ٱ

#: lam-alef ligatures -> lam + (normalized) alef
_LIGATURES = {"ﻻ": "لا", "ﻷ": "لا", "ﻹ": "لا",
              "ﻵ": "لا"}


def _normalize(w: str) -> str:
    out = []
    for ch in w:
        if ch in _STRIP:
            continue
        if ch in _LIGATURES:
            out.append(_LIGATURES[ch])
        else:
            out.append(_ALEF_FOLD.get(ch, ch))
    return "".join(out)


#: object/possessive pronoun suffixes shared by verb step 1 and noun
#: step 1a, longest first (two-character pronouns need a longer word)
_PRONOUNS_3 = ("كما", "هما")
_PRONOUNS_2 = ("ني", "نا", "ها", "هم", "هن", "كم", "كن")
_PRONOUNS_1 = ("ه", "ك", "ي")

#: verb conjugation endings
_VERB_2A = ("تما", "تم", "تن", "تا", "ت", "ن", "ا", "ي")
_VERB_2B = ("وا", "تمو")
_VERB_2C = ("و",)


def _strip_suffix(w: str, suffixes, min_len: int) -> str | None:
    for suf in suffixes:
        if w.endswith(suf) and len(w) - len(suf) >= 1 \
                and len(w) >= min_len + len(suf) - 1 \
                and len(w) - len(suf) >= min_len - 1:
            return w[: -len(suf)]
    return None


def stem(word: str) -> str:
    w = _normalize(word)
    if len(w) <= 2:
        return w

    # Checks1: definite article marks the word a (defined) noun
    is_noun = is_verb = True
    is_defined = False
    if (w.startswith("بال") or w.startswith("كال")) and len(w) > 4:
        is_noun, is_verb, is_defined = True, False, True
    elif (w.startswith("ال") or w.startswith("لل")) and len(w) > 3:
        is_noun, is_verb, is_defined = True, False, True

    # --- suffix stripping (backwards section of the spec) ---
    stripped = False
    if is_verb and not is_defined:
        # Suffix_Verb_Step1: attached object pronouns (word stays >= 3)
        out = _strip_suffix(w, _PRONOUNS_3, 5) \
            or _strip_suffix(w, _PRONOUNS_2, 4) \
            or _strip_suffix(w, _PRONOUNS_1, 4)
        if out is not None:
            w, stripped = out, True
            # Step2a/2c: conjugation ending before the pronoun
            out = _strip_suffix(w, _VERB_2A, 4) \
                or _strip_suffix(w, _VERB_2C, 4)
            if out is not None:
                w = out
        else:
            # Step2b then 2a: plain conjugation endings
            out = _strip_suffix(w, _VERB_2B, 5)
            if out is None:
                out = _strip_suffix(w, _VERB_2A, 4)
            if out is not None:
                w, stripped = out, True
    if is_noun and not stripped:
        # Suffix_Noun_Step2c2: feminine ة (kept when too short)
        if w.endswith("ة") and len(w) > 3:
            w, stripped = w[:-1], True
        if not stripped:
            # Step1a: possessive pronouns, then a case/number ending
            out = _strip_suffix(w, _PRONOUNS_3, 5) \
                or _strip_suffix(w, _PRONOUNS_2, 4) \
                or _strip_suffix(w, _PRONOUNS_1, 4)
            if out is not None:
                w, stripped = out, True
                out = _strip_suffix(w, ("ات",), 4) \
                    or _strip_suffix(w, ("ا", "ي", "و", "ت"), 4)
                if out is not None:
                    w = out
            else:
                # Step1b: sound plural ن after long vowel (..ون/..ين)
                if len(w) > 5 and w.endswith(("ون", "ين")) \
                        and not w.endswith("تين"):
                    w, stripped = w[:-2], True
                elif w.endswith("ات") and len(w) > 4:
                    w, stripped = w[:-2], True
                elif w.endswith(("ا", "ي", "و")) and len(w) > 4:
                    w, stripped = w[:-1], True
                elif w.endswith("ت") and len(w) > 3:
                    w, stripped = w[:-1], True
    # Suffix_All_alef_maqsura
    if w.endswith("ى"):
        w = w[:-1] + "ي"

    # --- prefix stripping ---
    # Prefix_Step1: interrogative/doubled alef
    if len(w) > 3 and w.startswith("اا"):
        w = w[1:]
    # Prefix_Step2: conjunctions و / ف followed by ا carrier
    if len(w) > 3 and w.startswith(("وا", "فا")) and not is_defined:
        pass  # ambiguous with root letters; the spec keeps these
    # Prefix_Step3a: definite article forms
    for art in ("بال", "كال", "فال", "وال"):
        if w.startswith(art) and len(w) > 5:
            w = w[len(art):]
            break
    else:
        for art in ("ال", "لل"):
            if w.startswith(art) and len(w) > 4:
                w = w[len(art):]
                break
    # Prefix_Step3b/4: single-letter prepositions and conjunctions
    for pre in ("ب", "ك", "ل", "و", "ف"):
        if w.startswith(pre) and len(w) > 4:
            if pre in ("و", "ف") and is_defined:
                break
            w = w[1:]
            break
    return w
