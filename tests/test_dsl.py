"""DSL parser tests — mirrors the reference's test_dsl.py cases
(/root/reference/test_dsl.py:12-102) plus the functional grammar."""

import pytest

from refimage_spark.dsl import (
    And,
    DSLParseError,
    Not,
    Or,
    TagFilter,
    TextQuery,
    parse,
)


def test_simple_text():
    assert parse("red car") == TextQuery("red car", 1.0)


def test_tags_only():
    assert parse("#sports #car") == TagFilter(("sports", "car"), "any")


def test_text_and_tag_implicit_and():
    n = parse("fast car #luxury")
    assert n == And((TextQuery("fast car", 1.0), TagFilter(("luxury",), "any")))


def test_or():
    n = parse("red car OR blue house")
    assert n == Or((TextQuery("red car", 1.0), TextQuery("blue house", 1.0)))


def test_and():
    n = parse("sports car AND #expensive")
    assert n == And((TextQuery("sports car", 1.0), TagFilter(("expensive",), "any")))


def test_weight():
    assert parse("luxury car^0.8") == TextQuery("luxury car", 0.8)


def test_weighted_or():
    n = parse("red car^0.8 OR blue car^0.6")
    assert n == Or((TextQuery("red car", 0.8), TextQuery("blue car", 0.6)))


def test_not_binary():
    n = parse("beach sunset NOT person")
    assert n == Not(TextQuery("beach sunset", 1.0), TextQuery("person", 1.0))


def test_case_insensitive_ops_and_tags():
    assert parse("a or b") == Or((TextQuery("a"), TextQuery("b")))
    assert parse("#Sports") == TagFilter(("sports",), "any")


def test_empty_rejected():
    for q in ["", "   ", None]:
        with pytest.raises(DSLParseError):
            parse(q)


def test_weight_range():
    assert parse("x^2.0") == TextQuery("x", 2.0)
    with pytest.raises(DSLParseError):
        parse("x^2.5")


def test_functional_grammar():
    n = parse('EXCLUDE(TEXT("beaches at sunset"), TEXT("people"))')
    assert n == Not(TextQuery("beaches at sunset"), TextQuery("people"))
    n = parse('AND(TEXT("red car"), OR(TEXT("a"), TEXT("b")))')
    assert n == And((TextQuery("red car"), Or((TextQuery("a"), TextQuery("b")))))
    n = parse('WEIGHT(TEXT("luxury"), 0.5)')
    assert n == TextQuery("luxury", 0.5)


def test_functional_rejects_trailing():
    with pytest.raises(DSLParseError):
        parse('TEXT("a") garbage')


def test_syntax_examples_all_parse():
    """The syntax() reference (S2 parity: /conversions/dsl-syntax) must
    only document queries the parser actually accepts."""
    from refimage_spark import dsl

    doc = dsl.syntax()
    assert doc["syntax_version"] == "1.0"
    assert set(doc["operators"]) == {"AND", "OR", "NOT", "^", "#"}
    for ex in doc["examples"]:
        node = dsl.parse(ex["query"])
        assert node is not None
