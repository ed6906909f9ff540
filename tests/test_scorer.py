from pd3f_ray.core.scorer import DeterministicScorer, get_scorer


def test_deterministic_and_singleton():
    s1 = get_scorer("multi")
    s2 = get_scorer("multi")
    assert s1 is s2
    a = s1.score(["the data table", "qzx wrtp"])
    b = s1.score(["the data table", "qzx wrtp"])
    assert a == b
    assert a[0] < a[1]  # vocab text scores better than junk


def test_single_score_single_char_inf():
    s = get_scorer("multi")
    assert s.single_score("x") == float("inf")
    assert s.single_score("xy") < float("inf")


def test_newline_or_not_special_cases():
    s = get_scorer("multi")
    assert s.newline_or_not("x", "the data") is True
    assert s.newline_or_not("the data", "y") is False


def test_newline_or_not_merges_fluent_continuation():
    s = get_scorer("multi")
    # mid-sentence fragment + lowercase continuation → space join (False)
    assert s.newline_or_not("The committee report on the", "annual budget total.") is False


def test_dehyphen_merge_known_word():
    s = get_scorer("multi")
    lines = [["im", "finan- "], ["ziellen", "bereich."]]
    out = s.dehyphen_paragraph(lines)
    assert out == [["im "], ["finanziellen", "bereich."]]


def test_dehyphen_keeps_compound_hyphen():
    s = get_scorer("multi")
    lines = [["die", "EU- "], ["Staaten", "sind."]]
    out = s.dehyphen_paragraph(lines)
    assert out == [["die "], ["EU-Staaten", "sind."]]


def test_dehyphen_no_hyphen_untouched():
    s = get_scorer("multi")
    lines = [["a", "b "], ["c", "d"]]
    assert s.dehyphen_paragraph(lines) == lines


def test_fast_model_name_parsing():
    sc = DeterministicScorer("multi-v0-fast")
    assert sc.fast is True


def test_is_split_paragraph_merges_midsentence():
    s = get_scorer("multi")
    p1 = [["The", "committee", "report", "on", "the"]]
    p2 = [["annual", "budget", "total."]]
    merged = s.is_split_paragraph(p1, p2)
    assert merged is not None
    assert merged[0][-1].endswith(" ")  # junction gains a space marker


def test_is_split_paragraph_rejects_complete_sentences():
    s = get_scorer("multi")
    p1 = [["The", "report", "is", "done."]]
    p2 = [["The", "next", "section", "follows."]]
    assert s.is_split_paragraph(p1, p2) is None
