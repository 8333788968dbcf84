"""Snowball stemmers for fr/es/pt/it/de — from-scratch implementations
of the published algorithms (snowballstem.org), core steps.

The reference's word_stem (presto-main/.../scalar/WordStemFunction.java)
delegates to Lucene's Snowball stemmers.  English (Porter2) lives in
porter2.py; this module covers the other five languages the reference's
TestWordStemFunction.java exercises.  The main suffix-removal steps
(standard suffixes, verb suffixes over RV, residual-vowel cleanup) are
implemented faithfully; a few rare branches (attached-pronoun step 0,
some accent foldings) are simplified — deviations surface in the
reference-literal floors, not silently.
"""

from __future__ import annotations


def _regions(word: str, vowels: str) -> tuple[int, int]:
    """R1/R2 per the Snowball definition."""
    n = len(word)
    r1 = n
    for i in range(1, n):
        if word[i] not in vowels and word[i - 1] in vowels:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in vowels and word[i - 1] in vowels:
            r2 = i + 1
            break
    return r1, r2


def _rv_romance(word: str, vowels: str) -> int:
    """RV per the Romance-language definition."""
    n = len(word)
    if n < 3:
        return n
    if word[1] not in vowels:  # X C : after the next vowel
        for i in range(2, n):
            if word[i] in vowels:
                return i + 1
        return n
    if word[0] in vowels and word[1] in vowels:  # V V : after next consonant
        for i in range(2, n):
            if word[i] not in vowels:
                return i + 1
        return n
    return 3  # C V : after the third letter


def _ends_in(word: str, sufs, region_start: int) -> str | None:
    """Longest suffix from ``sufs`` lying wholly inside the region."""
    for s in sorted(sufs, key=len, reverse=True):
        if word.endswith(s) and len(word) - len(s) >= region_start:
            return s
    return None


# --------------------------------------------------------------------------
# French
_FR_V = "aeiouyâàëéêèïîôûù"


def stem_fr(word: str) -> str:
    w = word
    r1, r2 = _regions(w, _FR_V)
    rv = _rv_romance(w, _FR_V)
    orig = w

    # step 1: standard suffixes
    s = _ends_in(w, ("ance", "ances", "isme", "ismes", "able", "ables",
                     "iste", "istes", "eux", "ique", "iques"), r2)
    if s:
        w = w[: -len(s)]
    elif (s := _ends_in(w, ("atrice", "ateur", "ation", "atrices",
                            "ateurs", "ations"), r2)):
        w = w[: -len(s)]
    elif (s := _ends_in(w, ("logie", "logies"), r2)):
        w = w[: -len(s)] + "log"
    elif (s := _ends_in(w, ("usion", "ution", "usions", "utions"), r2)):
        w = w[: -len(s)] + "u"
    elif (s := _ends_in(w, ("ence", "ences"), r2)):
        w = w[: -len(s)] + "ent"
    elif (s := _ends_in(w, ("ement", "ements"), rv)):
        w = w[: -len(s)]
    elif (s := _ends_in(w, ("ité", "ités"), r2)):
        w = w[: -len(s)]
    elif (s := _ends_in(w, ("if", "ive", "ifs", "ives"), r2)):
        w = w[: -len(s)]
    elif w.endswith("eaux"):
        w = w[:-1]
    elif (s := _ends_in(w, ("aux",), r1)):
        w = w[:-2] + "l"
    elif (s := _ends_in(w, ("euse", "euses"), r2)):
        w = w[: -len(s)]
    elif (s := _ends_in(w, ("ment", "ments"), rv)):
        if len(w) - len(s) - 1 >= 0 and w[len(w) - len(s) - 1] in _FR_V:
            w = w[: -len(s)]

    if w == orig:
        # step 2a: verb suffixes beginning i (preceded by a non-vowel)
        sufs_i = ("îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira",
                  "irai", "irais", "irait", "iras", "irent", "irez",
                  "iriez", "irions", "irons", "iront", "is", "issais",
                  "issait", "issant", "issante", "issantes", "issants",
                  "isse", "issent", "isses", "issez", "issiez",
                  "issions", "issons", "it")
        s = _ends_in(w, sufs_i, rv)
        if s and len(w) - len(s) - 1 >= rv - 1 and \
                len(w) - len(s) - 1 >= 0 and w[len(w) - len(s) - 1] not in _FR_V:
            w = w[: -len(s)]
        else:
            # step 2b: other verb suffixes in RV
            sufs_e = ("é", "ée", "ées", "és", "èrent", "er", "era",
                      "erai", "erais", "erait", "eras", "erez", "eriez",
                      "erions", "erons", "eront", "ez", "iez", "ions")
            sufs_a = ("âmes", "ât", "âtes", "a", "ai", "aient", "ais",
                      "ait", "ant", "ante", "antes", "ants", "as",
                      "asse", "assent", "asses", "assiez", "assions")
            sa = _ends_in(w, sufs_a, rv)
            se = _ends_in(w, sufs_e, rv)
            if sa and (not se or len(sa) > len(se)):
                w = w[: -len(sa)]
                if w.endswith("e") and len(w) - 1 >= rv:
                    w = w[:-1]
            elif se:
                w = w[: -len(se)]

    # step 4: residual
    if w.endswith("s") and len(w) >= 2 and w[-2] not in "aiouès":
        w = w[:-1]
    if (s := _ends_in(w, ("ion",), r2)) and len(w) >= 4 and w[-4] in "st":
        w = w[:-3]
    elif (s := _ends_in(w, ("ier", "ière"), rv)):
        w = w[: -len(s)] + "i"
    elif w.endswith("e") and len(w) - 1 >= rv:
        w = w[:-1]

    # step 5: undouble
    for d in ("enn", "onn", "ett", "ell", "eill"):
        if w.endswith(d):
            w = w[:-1]
            break
    return w


# --------------------------------------------------------------------------
# Spanish
_ES_V = "aeiouáéíóúü"


def stem_es(word: str) -> str:
    w = word
    r1, r2 = _regions(w, _ES_V)
    rv = _rv_romance(w, _ES_V)
    orig = w

    # step 1: standard suffixes
    s = _ends_in(w, ("anza", "anzas", "ico", "ica", "icos", "icas",
                     "ismo", "ismos", "able", "ables", "ible", "ibles",
                     "ista", "istas", "oso", "osa", "osos", "osas",
                     "amiento", "amientos", "imiento", "imientos"), r2)
    if s:
        w = w[: -len(s)]
    elif (s := _ends_in(w, ("adora", "ador", "ación", "adoras", "adores",
                            "aciones", "ante", "antes", "ancia",
                            "ancias"), r2)):
        w = w[: -len(s)]
        if (t := _ends_in(w, ("ic",), r2)):
            w = w[:-2]
    elif (s := _ends_in(w, ("logía", "logías"), r2)):
        w = w[: -len(s)] + "log"
    elif (s := _ends_in(w, ("ución", "uciones"), r2)):
        w = w[: -len(s)] + "u"
    elif (s := _ends_in(w, ("encia", "encias"), r2)):
        w = w[: -len(s)] + "ente"
    elif (s := _ends_in(w, ("mente",), r2)):
        w = w[: -len(s)]
    elif (s := _ends_in(w, ("idad", "idades"), r2)):
        w = w[: -len(s)]
    elif (s := _ends_in(w, ("iva", "ivo", "ivas", "ivos"), r2)):
        w = w[: -len(s)]

    if w == orig:
        # step 2a: -y- verb suffixes after u
        s = _ends_in(w, ("ya", "ye", "yan", "yen", "yeron", "yendo",
                         "yo", "yó", "yas", "yes", "yais", "yamos"), rv)
        if s and len(w) - len(s) - 1 >= 0 and w[len(w) - len(s) - 1] == "u":
            w = w[: -len(s)]
        else:
            # step 2b: verb suffixes in RV
            sufs = ("arían", "arías", "arán", "arás", "aríais", "aría",
                    "aréis", "aríamos", "aremos", "ará", "aré",
                    "erían", "erías", "erán", "erás", "eríais", "ería",
                    "eréis", "eríamos", "eremos", "erá", "eré",
                    "irían", "irías", "irán", "irás", "iríais", "iría",
                    "iréis", "iríamos", "iremos", "irá", "iré",
                    "aba", "ada", "ida", "ía", "ara", "iera", "ad",
                    "ed", "id", "ase", "iese", "aste", "iste", "an",
                    "aban", "ían", "aran", "ieran", "asen", "iesen",
                    "aron", "ieron", "ado", "ido", "ando", "iendo",
                    "ió", "ar", "er", "ir", "as", "abas", "adas",
                    "idas", "ías", "aras", "ieras", "ases", "ieses",
                    "ís", "áis", "abais", "íais", "arais", "ierais",
                    "aseis", "ieseis", "asteis", "isteis", "ados",
                    "idos", "amos", "ábamos", "íamos", "imos",
                    "áramos", "iéramos", "iésemos", "ásemos",
                    "en", "es", "éis", "emos")
            s = _ends_in(w, sufs, rv)
            if s:
                w = w[: -len(s)]
                if s in ("en", "es", "éis", "emos") and w.endswith("gu"):
                    w = w[:-1]

    # step 3: residual suffix
    s = _ends_in(w, ("os", "a", "o", "á", "í", "ó"), rv)
    if s:
        w = w[: -len(s)]
    elif (s := _ends_in(w, ("e", "é"), rv)):
        w = w[: -len(s)]
        if w.endswith("gu") and len(w) - 1 >= rv:
            w = w[:-1]

    return w.translate(str.maketrans("áéíóú", "aeiou"))


# --------------------------------------------------------------------------
# Portuguese
_PT_V = "aeiouáéíóúâêôãõ"


def stem_pt(word: str) -> str:
    w = word
    r1, r2 = _regions(w, _PT_V)
    rv = _rv_romance(w, _PT_V)
    orig = w

    s = _ends_in(w, ("eza", "ezas", "ico", "ica", "icos", "icas",
                     "ismo", "ismos", "ável", "ível", "ista", "istas",
                     "oso", "osa", "osos", "osas", "amento", "amentos",
                     "imento", "imentos"), r2)
    if s:
        w = w[: -len(s)]
    elif (s := _ends_in(w, ("adora", "ador", "ação", "adoras", "adores",
                            "ações", "ante", "antes", "ância"), r2)):
        w = w[: -len(s)]
        if _ends_in(w, ("ic",), r2):
            w = w[:-2]
    elif (s := _ends_in(w, ("logia", "logias"), r2)):
        w = w[: -len(s)] + "log"
    elif (s := _ends_in(w, ("ução", "uções"), r2)):
        w = w[: -len(s)] + "u"
    elif (s := _ends_in(w, ("ência", "ências"), r2)):
        w = w[: -len(s)] + "ente"
    elif (s := _ends_in(w, ("mente",), r2)):
        w = w[: -len(s)]
    elif (s := _ends_in(w, ("idade", "idades"), r2)):
        w = w[: -len(s)]
    elif (s := _ends_in(w, ("iva", "ivo", "ivas", "ivos"), r2)):
        w = w[: -len(s)]

    if w == orig:
        # verb suffixes in RV (step 2)
        sufs = ("aria", "arias", "ará", "arás", "aríamos", "aremos",
                "aríeis", "areis", "erias", "eria", "erá", "erás",
                "eríamos", "eremos", "iria", "irias", "irá", "irás",
                "iríamos", "iremos", "ava", "avas", "ada", "ida",
                "ia", "ias", "ara", "aras", "era", "eras", "ira",
                "iras", "am", "ado", "ido", "ando", "endo", "indo",
                "aram", "eram", "iram", "avam", "em", "ou", "iu", "eu",
                "ar", "er", "ir", "as", "adas", "idas", "iam", "aste",
                "este", "iste", "ei", "amos", "emos", "imos", "ámos",
                "ávamos", "íamos", "áramos", "éramos", "íramos",
                "es", "is", "eis", "ais")
        s = _ends_in(w, sufs, rv)
        if s:
            w = w[: -len(s)]

    # step 4: residual suffix
    if w == orig:
        s = _ends_in(w, ("os", "a", "i", "o", "á", "í", "ó"), rv)
        if s:
            w = w[: -len(s)]
    # step 5: final e/é/ê in RV
    if (s := _ends_in(w, ("e", "é", "ê"), rv)):
        w = w[: -len(s)]

    return w.translate(str.maketrans("áéíóúâêô", "aeiouaeo"))


# --------------------------------------------------------------------------
# Italian
_IT_V = "aeiouàèìòù"


def stem_it(word: str) -> str:
    w = word
    r1, r2 = _regions(w, _IT_V)
    rv = _rv_romance(w, _IT_V)
    orig = w

    s = _ends_in(w, ("anza", "anze", "ico", "ici", "ica", "ice", "iche",
                     "ichi", "ismo", "ismi", "abile", "abili", "ibile",
                     "ibili", "ista", "iste", "isti", "oso", "osi",
                     "osa", "ose", "mente", "atrice", "atrici", "ante",
                     "anti"), r2)
    if s:
        w = w[: -len(s)]
    elif (s := _ends_in(w, ("azione", "azioni", "atore", "atori"), r2)):
        w = w[: -len(s)]
        if _ends_in(w, ("ic",), r2):
            w = w[:-2]
    elif (s := _ends_in(w, ("logia", "logie"), r2)):
        w = w[: -len(s)] + "log"
    elif (s := _ends_in(w, ("uzione", "uzioni", "usione", "usioni"), r2)):
        w = w[: -len(s)] + "u"
    elif (s := _ends_in(w, ("enza", "enze"), r2)):
        w = w[: -len(s)] + "ente"
    elif (s := _ends_in(w, ("ità",), r2)):
        w = w[: -len(s)]
    elif (s := _ends_in(w, ("ivo", "ivi", "iva", "ive"), r2)):
        w = w[: -len(s)]

    if w == orig:
        # step 2: verb suffixes in RV
        sufs = ("erebbero", "irebbero", "assero", "assimo", "eranno",
                "erebbe", "eremmo", "ereste", "eresti", "essero",
                "iranno", "irebbe", "iremmo", "ireste", "iresti",
                "iscano", "iscono", "issero", "arono", "avamo", "avano",
                "avate", "eremo", "erete", "erono", "evamo", "evano",
                "evate", "iremo", "irete", "irono", "ivamo", "ivano",
                "ivate", "ammo", "ando", "asse", "assi", "emmo",
                "enda", "ende", "endi", "endo", "erai", "erei", "yamo",
                "iamo", "immo", "irai", "irei", "isca", "isce", "isci",
                "isco", "ano", "are", "ata", "ate", "ati", "ato",
                "ava", "avi", "avo", "erà", "ere", "erò", "ete", "eva",
                "evi", "evo", "irà", "ire", "irò", "ita", "ite", "iti",
                "ito", "iva", "ivi", "ivo", "ono", "uta", "ute", "uti",
                "uto", "ar", "ir")
        s = _ends_in(w, sufs, rv)
        if s:
            w = w[: -len(s)]

    # step 3a: final vowel in RV (twice for -io endings)
    for _ in range(2):
        if w and w[-1] in "aeioàèìò" and len(w) - 1 >= rv:
            if w[-1] in "io" or _ == 0:
                w = w[:-1]
            if not (w and w[-1] in "io"):
                break
        else:
            break
    # step 3b: ch/gh -> c/g
    if (w.endswith("ch") or w.endswith("gh")) and len(w) - 1 >= rv:
        w = w[:-1]
    return w


# --------------------------------------------------------------------------
# German
_DE_V = "aeiouyäöü"
_DE_S_END = "bdfghklmnrt"  # valid s-endings
_DE_ST_END = "bdfghklmnt"  # valid st-endings


def stem_de(word: str) -> str:
    w = word.replace("ß", "ss")
    r1, r2 = _regions(w, _DE_V)
    r1 = max(r1, 3)  # spec: region before R1 has >= 3 letters

    # step 1
    s = _ends_in(w, ("ern", "em", "er"), r1)
    if s:
        w = w[: -len(s)]
    elif (s := _ends_in(w, ("en", "es", "e"), r1)):
        w = w[: -len(s)]
        if w.endswith("niss"):
            w = w[:-1]
    elif w.endswith("s") and len(w) - 1 >= r1 and len(w) >= 2 \
            and w[-2] in _DE_S_END:
        w = w[:-1]

    # step 2
    s = _ends_in(w, ("est", "en", "er"), r1)
    if s:
        w = w[: -len(s)]
    elif w.endswith("st") and len(w) - 2 >= r1 and len(w) >= 6 \
            and w[-3] in _DE_ST_END:
        w = w[:-2]

    # step 3: d-suffixes
    r1b, r2b = _regions(w, _DE_V)
    if (s := _ends_in(w, ("end", "ung"), r2b)):
        w = w[: -len(s)]
        if w.endswith("ig") and len(w) - 2 >= r2b and not w.endswith("eig"):
            w = w[:-2]
    elif (s := _ends_in(w, ("ig", "ik", "isch"), r2b)):
        if not w[: -len(s)].endswith("e"):
            w = w[: -len(s)]
    elif (s := _ends_in(w, ("lich", "heit"), r2b)):
        w = w[: -len(s)]
        if (t := _ends_in(w, ("er", "en"), r1b)):
            w = w[: -len(t)]
    elif (s := _ends_in(w, ("keit",), r2b)):
        w = w[: -len(s)]
        if (t := _ends_in(w, ("lich", "ig"), r2b)):
            w = w[: -len(t)]

    return w.translate(str.maketrans("äöü", "aou"))


STEMMERS = {"fr": stem_fr, "es": stem_es, "pt": stem_pt,
            "it": stem_it, "de": stem_de}
