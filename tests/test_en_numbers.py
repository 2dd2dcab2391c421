"""Number-word normalization (whisper EnglishNumberNormalizer core)."""
from dataflow_mm_ray.functions.en_numbers import normalize_number_words as nn


def test_cardinals():
    assert nn("twenty five cats") == "25 cats"
    assert nn("one hundred and five") == "105"
    assert nn("three hundred and twenty one thousand") == "321000"
    assert nn("two million three hundred thousand") == "2300000"
    assert nn("nineteen eighty") == "19 80"  # year-style stays two numbers
    assert nn("twenty-five") == "25"
    assert nn("a hundred") == "100"
    assert nn("zero") == "0"


def test_solitary_one_kept():
    assert nn("one of them left") == "one of them left"
    assert nn("one hundred left") == "100 left"
    assert nn("twenty one left") == "21 left"


def test_decimals_percent_currency():
    assert nn("three point one four") == "3.14"
    assert nn("fifty percent done") == "50% done"
    assert nn("five dollars each") == "$5 each"
    assert nn("two hundred euros") == "€200"


def test_ordinals():
    assert nn("the third time") == "the 3rd time"
    assert nn("twenty-first century") == "21st century"
    assert nn("the twentieth and the second") == "the 20th and the 2nd"
    assert nn("one hundredth attempt") == "100th attempt"


def test_and_not_swallowed():
    assert nn("cats and dogs") == "cats and dogs"
    assert nn("five and dime") == "5 and dime"


def test_plain_text_untouched():
    s = "hello world nothing numeric here"
    assert nn(s) == s


def test_integration_with_en_text_norm():
    from dataflow_mm_ray.functions.en_text_norm import en_text_norm

    assert en_text_norm("I'll take twenty-five percent of three hundred dollars.") == \
        "i will take 25% of $300"
    assert en_text_norm("The third try, um, cost two point five euros") == \
        "the 3rd try cost €2.5"


def test_punctuation_adjacent_numbers():
    assert nn("it cost five.") == "it cost 5."
    assert nn("five, six") == "5, 6"
    assert nn("he has twenty-five, i think") == "he has 25, i think"
    assert nn("(three hundred) items") == "(300) items"
    assert nn("one hundred, and five") == "100, and 5"


def test_one_heads_numeric_expressions():
    assert nn("one point five") == "1.5"
    assert nn("one percent") == "1%"
    assert nn("one dollars") == "$1"  # plural stub follows whisper's postfix rule
    assert nn("one of them") == "one of them"


def test_trailing_and_not_consumed():
    """'and' joins a group only when a joinable number follows
    ('one hundred and five'); between two standalone numbers it is
    ordinary text (reviewed bug: 'five and six' lost the 'and')."""
    from dataflow_mm_ray.functions.en_numbers import normalize_number_words as n

    assert n("five and six") == "5 and 6"
    assert n("between one and two") == "between one and 2"  # solitary-one kept
    assert n("one hundred and five") == "105"
    assert n("one thousand and one") == "1001"
    assert n("seven and a half") == "7 and a half"
