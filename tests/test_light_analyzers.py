# -*- coding: utf-8 -*-
"""Arabic / Persian / Czech / Hindi light analyzer golden tests
(analysis/light.py; reference chains ar/ fa/ cz/ hi/ under
lucene/analysis/common)."""

from lucene_solr_ray.analysis import get_analyzer
from lucene_solr_ray.analysis.light import (
    arabic_normalize,
    arabic_stem,
    czech_stem,
    hindi_normalize,
    hindi_stem,
    persian_normalize,
)


def test_arabic_normalize():
    # hamza forms fold to bare alef; teh marbuta -> heh; dotless yeh -> yeh
    assert arabic_normalize("أآإ") == "ااا"
    assert arabic_normalize("مدرسة") == "مدرسه"
    assert arabic_normalize("مصطفى") == "مصطفي"
    # harakat and tatweel removed
    assert arabic_normalize("مُحَمَّد") == "محمد"
    assert arabic_normalize("كتـــاب") == "كتاب"


def test_arabic_stem_light10():
    assert arabic_stem("والكتاب") == "كتاب"      # wal- prefix
    assert arabic_stem("المدرسة") == "مدرس"      # al- prefix + ta marbuta
    assert arabic_stem("كتابها") == "كتاب"        # -ha suffix
    assert arabic_stem("مدرسون") == "مدرس"        # -un plural
    # bare waw prefix needs >= 3 remaining chars
    assert arabic_stem("وله")[0] == "و"


def test_persian_normalize():
    # arabic kaf/yeh -> farsi forms; ZWNJ removed
    assert persian_normalize("كتاب") == "کتاب"
    assert persian_normalize("علي") == "علی"
    assert persian_normalize("كتاب‌ها") == "کتابها"


def test_czech_stem():
    assert czech_stem("města") == "měst"       # case ending
    assert czech_stem("městě") == "měst"
    assert czech_stem("Praze".lower()) == "prah"   # palatalization z->h
    # possessive -in stripped, then the palatalized č folds back to k
    assert czech_stem("matčin") == "matk"
    assert czech_stem("pánové") == "pán"       # -ové
    # keeps >= 3 chars
    assert czech_stem("les") == "les"


def test_hindi_stem():
    assert hindi_normalize("लड़का") == "लडका"    # nukta folded
    assert hindi_stem("लड़का") == "लडक"          # final aa matraa
    assert hindi_stem("किताबें") == "किताब"       # -en plural
    assert hindi_stem("किताबों") == "किताब"
    # too short to strip
    assert hindi_stem("की") == "की"


def test_analyzer_chains_registered():
    assert get_analyzer("arabic").tokens("والكتاب كتابها") == [
        "كتاب", "كتاب"]
    assert get_analyzer("persian").tokens("يك كتاب") == ["یک", "کتاب"]
    assert get_analyzer("czech").tokens("krásná města") == [
        "krásn", "měst"]
    assert get_analyzer("hindi").tokens("किताबें और लड़का") == [
        "किताब", "लडक"]


def test_batch_path_matches_single():
    texts = ["والكتاب كتابها", "", "المدرسة"]
    a = get_analyzer("arabic")
    t, d, p = a.tokens_batch(texts)
    flat = []
    for x in texts:
        flat += a.tokens(x)
    assert t == flat


def test_finnish_light_stem():
    from lucene_solr_ray.analysis.light import finnish_light_stem as fi

    assert fi("taloissa") == "talo"        # inessive plural
    assert fi("talossakin") == "talo"      # -kin clitic stacks
    assert fi("kirjat") == "kirj"          # nominative plural
    assert fi("presidentin") == "presiden"  # genitive
    assert fi("kauniisti") == "kaun"       # -sti adverb + final-i norms
    assert fi("abc") == "abc"              # len < 4 untouched
    # ä/å/ö fold before stemming
    assert fi("määrä")[0] == "m" and "ä" not in fi("määrä")


def test_hungarian_light_stem():
    from lucene_solr_ray.analysis.light import hungarian_light_stem as hu

    assert hu("házak") == "haz"            # accent fold + -ak plural
    assert hu("királynak") == "kiraly"     # dative -nak
    assert hu("alma") == "alm"             # possessive final -a
    assert hu("kertben") == "kert"         # inessive -ben
    assert hu("könyvei") == "konyv"        # possessive -i + final vowel


def test_bulgarian_stem():
    from lucene_solr_ray.analysis.light import bulgarian_stem as bg

    assert bg("градът") == "град"          # masculine definite article
    assert bg("книгите") == "книг"         # plural + article
    assert bg("градове") == "град"         # -ове plural
    assert bg("ден") == "ден"              # len < 4 untouched


def test_turkish_fold_and_chain():
    from lucene_solr_ray.analysis.light import turkish_fold

    assert turkish_fold("Türkiye'nin") == "türkiye"  # apostrophe strip
    assert turkish_fold("İstanbul") == "istanbul"    # dotted capital I
    assert turkish_fold("ISPARTA") == "ısparta"      # dotless lowercase
    a = get_analyzer("turkish")
    assert a.tokens("Türkiye'nin İstanbul şehri") == [
        "türkiye", "istanbul", "şehri"]
    t, d, p = a.tokens_batch(["İstanbul'da ve Ankara'da", ""])
    assert t == a.tokens("İstanbul'da ve Ankara'da")


def test_new_chains_registered():
    assert get_analyzer("finnish").tokens("Taloissa ja kirjat") == [
        "talo", "kirj"]
    assert get_analyzer("hungarian").tokens("a házak és király") == [
        "haz", "kiraly"]
    assert get_analyzer("bulgarian").tokens("градът и книгите") == [
        "град", "книг"]


def test_indonesian_stem_reference_vectors():
    """The published examples from Tala's thesis, as pinned by the
    reference's own TestIndonesianStemmer.java."""
    from lucene_solr_ray.analysis.light import indonesian_stem as st

    vectors = [
        ("bukukah", "buku"), ("adalah", "ada"), ("bukupun", "buku"),
        ("bukuku", "buku"), ("bukumu", "buku"), ("bukunya", "buku"),
        ("mengukur", "ukur"), ("menyapu", "sapu"), ("menduga", "duga"),
        ("menuduh", "uduh"), ("membaca", "baca"), ("merusak", "rusak"),
        ("pengukur", "ukur"), ("penyapu", "sapu"), ("penduga", "duga"),
        ("pembaca", "baca"), ("diukur", "ukur"), ("tersapu", "sapu"),
        ("kekasih", "kasih"), ("berlari", "lari"), ("belajar", "ajar"),
        ("bekerja", "kerja"), ("perjelas", "jelas"), ("pelajar", "ajar"),
        ("pekerja", "kerja"), ("tarikkan", "tarik"),
        ("ambilkan", "ambil"), ("mengambilkan", "ambil"),
        ("makanan", "makan"), ("janjian", "janji"),
        ("perjanjian", "janji"), ("tandai", "tanda"),
        ("dapati", "dapat"), ("mendapati", "dapat"), ("pantai", "panta"),
        ("penyalahgunaan", "salahguna"),
        ("menyalahgunakan", "salahguna"),
        ("disalahgunakan", "salahguna"),
        ("pertanggungjawaban", "tanggungjawab"),
        ("mempertanggungjawabkan", "tanggungjawab"),
        ("dipertanggungjawabkan", "tanggungjawab"),
    ]
    for w, want in vectors:
        assert st(w) == want, (w, st(w), want)
    # inflectional-only mode stops after particles/possessives
    assert st("bukukah", derivational=False) == "buku"
    assert st("mengukur", derivational=False) == "mengukur"
    assert get_analyzer("indonesian").tokens(
        "membaca bukunya di perjanjian") == ["baca", "buku", "janji"]


def test_latvian_stem_reference_vectors():
    """Declension I-IV vectors as pinned by the reference's
    TestLatvianStemmer.java (incl. č/ņ palatalization folds)."""
    from lucene_solr_ray.analysis.light import latvian_stem as lv

    vectors = [
        # decl I
        ("tēvs", "tēv"), ("tēvi", "tēv"), ("tēva", "tēv"),
        ("tēvu", "tēv"), ("tēvam", "tēv"), ("tēviem", "tēv"),
        ("tēvus", "tēv"), ("tēvā", "tēv"), ("tēvos", "tēv"),
        # decl II c -> č palatalization
        ("lācis", "lāc"), ("lāči", "lāc"), ("lāča", "lāc"),
        ("lāču", "lāc"), ("lācim", "lāc"), ("lāčiem", "lāc"),
        ("lāci", "lāc"), ("lāčus", "lāc"), ("lācī", "lāc"),
        ("lāčos", "lāc"),
        # n -> ņ palatalization
        ("akmens", "akmen"), ("akmeņi", "akmen"), ("akmeņu", "akmen"),
        ("akmenim", "akmen"), ("akmeņiem", "akmen"), ("akmeni", "akmen"),
        ("akmeņus", "akmen"), ("akmenī", "akmen"), ("akmeņos", "akmen"),
        # no palatalization (labial + j)
        ("kurmis", "kurm"), ("kurmji", "kurm"), ("kurmja", "kurm"),
        ("kurmju", "kurm"), ("kurmjiem", "kurm"), ("kurmjus", "kurm"),
        # decl III / IV
        ("lietus", "liet"), ("lietum", "liet"), ("lietū", "liet"),
        ("lapa", "lap"), ("lapas", "lap"), ("lapai", "lap"),
        ("lapām", "lap"), ("lapā", "lap"), ("lapās", "lap"),
    ]
    for w, want in vectors:
        assert lv(w) == want, (w, lv(w), want)
    assert get_analyzer("latvian").tokens("lāči un lapas") == [
        "lāc", "lap"]


def test_greek_lowercase_and_stem():
    from lucene_solr_ray.analysis.light2 import (
        greek_light_stem,
        greek_lowercase,
    )

    # GreekLowerCaseFilter: tonos stripped, final sigma normalized
    assert greek_lowercase("Καλώς") == "καλωσ"
    assert greek_lowercase("ΠΡΟΪΌΝ") == "προιον"
    # one lemma's inflection family -> one stem
    fam = ["άνθρωποι", "ανθρώπων", "άνθρωπο", "ανθρώπους"]
    stems = {greek_light_stem(w) for w in fam}
    assert stems == {"ανθρωπ"}
    # idempotent
    for w in fam:
        s = greek_light_stem(w)
        assert greek_light_stem(s) == s


def test_romanian_light_stem_family():
    from lucene_solr_ray.analysis.light2 import romanian_light_stem as st

    assert st("orasul") == "oras"
    assert st("orasului") == "oras"
    assert st("orase") == "oras"
    assert st("oraselor") == "oras"
    # minimum-stem guard: short words survive
    assert st("nu") == "nu"


def test_catalan_elision_and_stem():
    from lucene_solr_ray.analysis.light2 import (
        catalan_elide,
        catalan_light_stem,
    )

    assert catalan_elide("l'home") == "home"
    assert catalan_elide("d'aigua") == "aigua"
    assert catalan_elide("qu'il") == "qu'il"  # not in the catalan set
    fam = ["paraula", "paraules"]
    assert {catalan_light_stem(w) for w in fam} == {"paraul"}
    assert catalan_light_stem("l'organitzacions") == \
        catalan_light_stem("organitzacio")


def test_light2_registered_and_chain():
    from lucene_solr_ray.analysis import get_analyzer

    el = get_analyzer("greek")
    assert el.tokens("Οι άνθρωποι και τα μήλα") == ["ανθρωπ", "μηλ"]
    ro = get_analyzer("romanian")
    assert "oras" in ro.tokens("orasele din romania")
    ca = get_analyzer("catalan")
    assert ca.tokens("l'home i les paraules") == ["home", "paraul"]


def test_irish_lowercase_and_elision():
    from lucene_solr_ray.analysis.light2 import (
        irish_elide,
        irish_lowercase,
    )

    # n-/t- prothesis boundary preserved with a hyphen
    assert irish_lowercase("nAthair") == "n-athair"
    assert irish_lowercase("tSaol") == "t-saol"
    # plain words just lowercase (no hyphen for lowercase vowels)
    assert irish_lowercase("nathair") == "nathair"
    assert irish_lowercase("Teach") == "teach"
    assert irish_elide("d'fhear") == "fhear"
    assert irish_elide("b'amhlaidh") == "amhlaidh"
    assert irish_elide("x'keep") == "x'keep"


def test_galician_minimal_plural():
    from lucene_solr_ray.analysis.light2 import galician_minimal_stem

    assert galician_minimal_stem("homes") == "home"
    assert galician_minimal_stem("cancións") == "canción"
    assert galician_minimal_stem("mans") == "man"
    # guards: short words and non-plurals untouched
    assert galician_minimal_stem("das") == "das"
    assert galician_minimal_stem("home") == "home"


def test_sorani_normalize_and_stem():
    from lucene_solr_ray.analysis.light2 import (
        sorani_normalize,
        sorani_stem,
    )

    # Arabic yeh/kaf variants unify
    assert sorani_normalize("كتاب") == "کتاب"
    assert sorani_normalize("علي") == "علی"
    # definite-plural strips to the stem
    assert sorani_stem("كتابەکان") == "کتاب"
    s = sorani_stem("کتابەکە")
    assert s == "کتاب"
    # idempotent
    assert sorani_stem(s) == s


def test_batch2b_registered():
    from lucene_solr_ray.analysis import get_analyzer

    assert get_analyzer("irish").tokens("nAthair agus d'fhear") == \
        ["n-athair", "fhear"]
    assert "home" in get_analyzer("galician").tokens("os homes")
    assert get_analyzer("sorani").tokens("كتابەکان") == ["کتاب"]
