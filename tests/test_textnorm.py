from pd3f_ray.core.textnorm import (
    char_bag_jaccard,
    clean_text,
    fix_text,
    has_alnum,
    strip_line_end_spaces,
)


def test_fix_text_mojibake():
    assert fix_text("GeschÃ¤ft") == "Geschäft"
    assert fix_text("Ã¼berall") == "überall"
    assert fix_text("plain text") == "plain text"
    assert fix_text("") == ""
    # idempotent on already-clean umlauts
    assert fix_text("Geschäft") == "Geschäft"


def test_clean_text_variants():
    assert clean_text("Hello, World!") == "hello, world!"
    assert clean_text("Hello, World!", no_punct=True) == "hello world"
    assert clean_text("Seite 3 von 12", replace_with_number="", no_punct=True) == "seite von"
    assert clean_text("Ärger", no_punct=True) == "arger"


def test_char_bag_jaccard():
    assert char_bag_jaccard("abc", "abc") == 1.0
    assert char_bag_jaccard("", "") == 1.0
    assert char_bag_jaccard("aab", "ab") == 2 / 3
    assert 0.0 < char_bag_jaccard("abcd", "abce") < 1.0


def test_has_alnum():
    assert has_alnum("a1")
    assert not has_alnum("***")
    assert not has_alnum("—…!")


def test_strip_line_end_spaces():
    # mirrors reference string_utils semantics
    assert strip_line_end_spaces("the text  \n") == "the text\n"
    assert strip_line_end_spaces("the text\n") == "the text\n"
    assert strip_line_end_spaces("x") == "x"
    assert strip_line_end_spaces(" \n") == "\n"
