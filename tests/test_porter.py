"""Porter goldens per FIXTURES.md §3 (classic cases from the 1980 paper,
matching the reference's tartarus Release-4 variant)."""

import pytest

from terrier_spark.text.porter import porter_stem

GOLDENS = [
    # step1 examples (PorterStemmer.java:252-276 comment block)
    ("caresses", "caress"),
    ("ponies", "poni"),
    ("ties", "ti"),
    ("caress", "caress"),
    ("cats", "cat"),
    ("feed", "feed"),
    ("agreed", "agre"),
    ("disabled", "disabl"),
    ("matting", "mat"),
    ("mating", "mate"),
    ("meeting", "meet"),
    ("milling", "mill"),
    ("messing", "mess"),
    ("meetings", "meet"),
    # FIXTURES.md §3
    ("relational", "relat"),
    ("conditional", "condit"),
    ("happy", "happi"),
    ("generalization", "gener"),
    # classic vocabulary checks
    # "-ization" alone: step3 skips (m()==0 before the suffix), but step5
    # strips "ion" after 't' since m("izat") = 2
    ("ization", "izat"),
    ("sky", "sky"),
    ("skies", "ski"),
    ("plastered", "plaster"),
    ("bled", "bled"),
    ("motoring", "motor"),
    ("sing", "sing"),
    ("conflated", "conflat"),
    ("troubled", "troubl"),
    ("sized", "size"),
    ("hopping", "hop"),
    ("tanned", "tan"),
    ("falling", "fall"),
    ("hissing", "hiss"),
    ("fizzed", "fizz"),
    ("failing", "fail"),
    ("filing", "file"),
    ("rational", "ration"),
    ("valenci", "valenc"),
    ("digitizer", "digit"),
    ("operator", "oper"),
    ("feudalism", "feudal"),
    ("decisiveness", "decis"),
    ("hopefulness", "hope"),
    ("callousness", "callous"),
    ("formaliti", "formal"),
    ("sensitiviti", "sensit"),
    ("sensibiliti", "sensibl"),
    ("triplicate", "triplic"),
    ("formative", "form"),
    ("formalize", "formal"),
    ("electriciti", "electr"),
    ("electrical", "electr"),
    ("hopeful", "hope"),
    ("goodness", "good"),
    ("revival", "reviv"),
    ("allowance", "allow"),
    ("inference", "infer"),
    ("airliner", "airlin"),
    ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"),
    ("defensible", "defens"),
    ("irritant", "irrit"),
    ("replacement", "replac"),
    ("adjustment", "adjust"),
    ("dependent", "depend"),
    ("adoption", "adopt"),
    ("homologou", "homolog"),
    ("communism", "commun"),
    ("activate", "activ"),
    ("angulariti", "angular"),
    ("homologous", "homolog"),
    ("effective", "effect"),
    ("bowdlerize", "bowdler"),
    ("probate", "probat"),
    ("rate", "rate"),
    ("cease", "ceas"),
    ("controll", "control"),
    ("roll", "roll"),
    # short-word bypass (stem() only runs when k > 1, i.e. length > 2)
    ("is", "is"),
    ("be", "be"),
    ("as", "as"),
    ("do", "do"),
    ("abc", "abc"),
]


@pytest.mark.parametrize("word,expected", GOLDENS)
def test_porter_goldens(word, expected):
    assert porter_stem(word) == expected


def test_digit_terms_pass_through_sanely():
    # code tokens with digits: digits are consonants; must not crash
    assert porter_stem("x1234") == "x1234"
    assert porter_stem("utf8") == "utf8"


def test_idempotent_on_cache():
    assert porter_stem("running") == "run"
    assert porter_stem("running") == "run"
