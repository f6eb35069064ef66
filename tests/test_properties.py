"""Property-based tests (hypothesis): engine operators vs local Python models
on randomized inputs. Few examples per property — each example is a Spark
job — but each example covers a whole randomized input set."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings, strategies as st

from data_engineering_assignment_spark.operators.text import (
    ROLLING_BASE,
    ROLLING_MOD,
    rolling_hash,
)
from data_engineering_assignment_spark.operators.topk import top_k_by_freq
from data_engineering_assignment_spark.pipelines import football as fb
from data_engineering_assignment_spark.schemas import FOOTBALL_EVENT_SCHEMA

SETTINGS = dict(max_examples=8, deadline=None)

ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60
)


@settings(**SETTINGS)
@given(st.lists(ascii_text, min_size=1, max_size=8))
def test_rolling_hash_matches_python_model(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, text string")
    got = {r["i"]: r["h"] for r in df.select("i", rolling_hash("text").alias("h")).collect()}
    for i, t in enumerate(texts):
        h = 0
        for ch in t:
            h = (h * ROLLING_BASE + ord(ch)) % ROLLING_MOD
        assert got[i] == h


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.sampled_from(["g1", "g2"]), st.sampled_from(list("abcde"))),
        min_size=1,
        max_size=40,
    )
)
def test_topk_matches_counter(spark, pairs):
    df = spark.createDataFrame(pairs, "grp string, item string")
    out = top_k_by_freq(df, ["grp"], "item", k=3).collect()
    for grp in {g for g, _ in pairs}:
        counts = Counter(i for g, i in pairs if g == grp)
        got = sorted(
            ((r["item"], r["n"]) for r in out if r["grp"] == grp),
            key=lambda x: (-x[1], x[0]),
        )
        # engine tie-break is (count desc, item asc); Counter.most_common is
        # insertion-ordered on ties — compare the multiset of counts and that
        # every reported item's count is exact
        want_counts = sorted(counts.values(), reverse=True)[: len(got)]
        assert [n for _, n in got] == want_counts
        assert all(counts[i] == n for i, n in got)


match_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),   # home team id
        st.integers(0, 5),   # away team id
        st.integers(0, 3),   # home goals
        st.integers(0, 3),   # away goals
    ).filter(lambda m: m[0] != m[1]),
    min_size=1,
    max_size=12,
)


@settings(**SETTINGS)
@given(match_strategy)
def test_league_invariants_on_random_seasons(spark, matches):
    rows = []
    for mid, (h, a, hg, ag) in enumerate(matches):
        home, away = f"T{h}", f"T{a}"
        # goals come from the CONCEDING keeper's save attempt (Basic-2 rule)
        for _ in range(hg):
            rows.append(("L", "s", mid, 0, home, away, "Save attempt", None,
                         away, None, "1H", 1.0, ["Goal"], None, None))
        for _ in range(ag):
            rows.append(("L", "s", mid, 0, home, away, "Save attempt", None,
                         home, None, "1H", 1.0, ["Goal"], None, None))
        rows.append(("L", "s", mid, 0, home, away, "Pass", None, home, None,
                     "1H", 1.0, [], None, None))
    events = spark.createDataFrame(rows, FOOTBALL_EVENT_SCHEMA)
    table = fb.season_table(fb.match_results(events)).collect()
    assert sum(r["games"] for r in table) == 2 * len(matches)
    assert sum(r["goalsScored"] for r in table) == sum(r["goalsConceded"] for r in table)
    for r in table:
        assert r["wins"] + r["draws"] + r["losses"] == r["games"]
        assert r["points"] == 3 * r["wins"] + r["draws"]


cdc_changes = st.lists(
    st.tuples(
        st.integers(0, 6),                      # key
        st.sampled_from(["U", "D"]),            # op
        st.floats(-100, 100, allow_nan=False),  # new value
    ),
    min_size=1,
    max_size=15,
)


@settings(**SETTINGS)
@given(cdc_changes)
def test_apply_changes_matches_dict_model(spark, ops):
    from data_engineering_assignment_spark.operators.cdc import apply_changes

    base_rows = [(k, float(k) * 10.0) for k in range(4)]
    base = spark.createDataFrame(base_rows, "k bigint, v double")
    # distinct seqs via enumeration → fully deterministic latest-wins
    chg_rows = [(k, v, i, op) for i, (k, op, v) in enumerate(ops)]
    changes = spark.createDataFrame(chg_rows, "k bigint, v double, seq int, op string")
    got = {r["k"]: r["v"] for r in apply_changes(base, changes, ["k"]).collect()}

    model = dict(base_rows)
    for k, op, v in ops:  # ops are already in ascending-seq order
        if op == "D":
            model.pop(k, None)
        else:
            model[k] = v
    assert got == model


@settings(**SETTINGS)
@given(
    st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=30,
    )
)
def test_dround_matches_duckdb(spark, values):
    """The decimal-detour rounding must agree with its oracle twin
    (o_dround) bit-for-bit — the exact midpoint cases plain F.round gets
    wrong are fair game for hypothesis to find."""
    import duckdb

    from data_engineering_assignment_spark.operators.aggregates import dround
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i int, x double")
    got = {r["i"]: r["r"] for r in df.select("i", dround(F.col("x"), 4).alias("r")).collect()}
    con = duckdb.connect()
    for i, v in enumerate(values):
        want = con.execute(
            "SELECT ROUND(CAST(? AS DECIMAL(27,8)), 4)::DOUBLE", [v]
        ).fetchone()[0]
        assert got[i] == want, (v, got[i], want)


_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"])
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@settings(**SETTINGS)
@given(st.lists(_doc, min_size=2, max_size=10), st.sampled_from([0.3, 0.5, 0.8]))
def test_prefix_join_equals_brute_force_fuzz(spark, docs, t):
    """Prefix filtering + positional/size bounds must equal the all-pairs
    join on ANY corpus — the tiny word alphabet forces heavy shingle
    sharing, duplicate docs, and boundary Jaccard values."""
    from data_engineering_assignment_spark.operators.dedup import (
        jaccard_prefix_join,
        ngram_jaccard_pairs,
    )

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = sorted(
        (r["doc_a"], r["doc_b"], r["inter"], r["jaccard"])
        for r in jaccard_prefix_join(df, threshold=t, n=2).collect()
    )
    want = sorted(
        (r["doc_a"], r["doc_b"], r["inter"], r["jaccard"])
        for r in ngram_jaccard_pairs(df, threshold=t, n=2).collect()
    )
    assert got == want


@settings(**SETTINGS)
@given(
    st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
             min_size=2, max_size=12, unique=True),
    st.sampled_from([(2, 1), (4, 3), (5, 3)]),
)
def test_simhash_band_pairs_fuzz(spark, fps, br):
    """Banded Hamming-ball generation must equal brute force for ANY
    fingerprints (including sign bits) at any (bands, radius)."""
    from itertools import combinations

    from data_engineering_assignment_spark.operators.dedup import simhash_band_pairs

    bands, radius = br
    df = spark.createDataFrame(list(enumerate(fps)), "doc long, simhash31 long")
    got = sorted(
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_band_pairs(df, bits=64, bands=bands, radius=radius).collect()
    )
    fp_by_id = dict(enumerate(fps))
    mask = (1 << 64) - 1
    want = sorted(
        (a, b, bin((fp_by_id[a] ^ fp_by_id[b]) & mask).count("1"))
        for a, b in combinations(sorted(fp_by_id), 2)
        if bin((fp_by_id[a] ^ fp_by_id[b]) & mask).count("1") <= radius
    )
    assert got == want


small_word = st.text(alphabet="ab", min_size=1, max_size=3)
small_doc = st.lists(small_word, min_size=1, max_size=12).map(" ".join)


@settings(**SETTINGS)
@given(st.lists(small_doc, min_size=1, max_size=8))
def test_paragraph_dedup_matches_python_model(spark, texts):
    """paragraph_dedup_stats vs a local keep-first model on random corpora
    over a 2-letter alphabet (dense cross-doc paragraph collisions).
    size=2 so most docs span several paragraphs."""
    from data_engineering_assignment_spark.operators.corpus import (
        paragraph_dedup_stats,
    )

    size = 2
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["n_dropped"], r["kept_char_ratio"])
        for r in paragraph_dedup_stats(df, size=size).collect()
    }

    paras = []  # (doc, idx, para) in global keep-first order
    for d, t in enumerate(texts):
        toks = t.split(" ")
        for i, s in enumerate(range(0, len(toks), size)):
            paras.append((d, i, " ".join(toks[s : s + size])))
    first: dict[str, tuple[int, int]] = {}
    for d, i, p in paras:  # already (doc, idx)-ordered
        first.setdefault(p, (d, i))
    for d, t in enumerate(texts):
        mine = [(i, p) for (dd, i, p) in paras if dd == d]
        kept = [(i, p) for (i, p) in mine if first[p] == (d, i)]
        total_chars = sum(len(p) for _, p in mine)
        kept_chars = sum(len(p) for _, p in kept)
        n_paras, n_kept, n_dropped, ratio = got[d]
        assert (n_paras, n_kept, n_dropped) == (
            len(mine),
            len(kept),
            len(mine) - len(kept),
        )
        if total_chars > 0:
            # dround is decimal HALF_UP; allow half a 4-dp ulp of slack
            assert ratio == pytest.approx(kept_chars / total_chars, abs=6e-5)
        else:
            assert ratio is None


@settings(**SETTINGS)
@given(st.lists(small_doc, min_size=1, max_size=8))
def test_bpe_merge_pairs_matches_counter_model(spark, texts):
    """bpe_merge_pairs vs a Counter model: same weighted pair counts, same
    (n DESC, pair ASC) ranking."""
    from data_engineering_assignment_spark.operators.corpus import bpe_merge_pairs

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    words = Counter(w for t in texts for w in t.split(" "))
    pairs: Counter = Counter()
    for w, f in words.items():
        for i in range(len(w) - 1):
            pairs[w[i : i + 2]] += f
    want = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
    got = [
        (r["pair"], r["n"], r["rnk"])
        for r in bpe_merge_pairs(df, k=100).orderBy("rnk").collect()
    ]
    assert got == [(p, n, i + 1) for i, (p, n) in enumerate(want)]


@settings(**SETTINGS)
@given(
    st.lists(
        st.text(alphabet=st.sampled_from("ab c"), min_size=0, max_size=30),
        min_size=1,
        max_size=6,
    )
)
def test_bpe_train_matches_python_model(spark, texts):
    """The distributed BPE loop vs a literal Python re-implementation of
    Sennrich's algorithm (recount pairs, argmax under (n desc, lhs, rhs),
    greedy left-to-right merge) on random small corpora."""
    from collections import Counter

    from data_engineering_assignment_spark.operators.corpus import bpe_train

    k = 4
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["rnk"], r["lhs"], r["rhs"], r["n"])
        for r in bpe_train(df, k=k).orderBy("rnk").collect()
    ]

    words = Counter()
    for t in texts:
        for tok in t.split(" "):
            if len(tok) >= 2:
                words[tok] += 1
    state = {w: [list(w), f] for w, f in words.items()}
    want = []
    for rnk in range(1, k + 1):
        pairs = Counter()
        for syms, f in state.values():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (lhs, rhs), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        want.append((rnk, lhs, rhs, n))
        for entry in state.values():
            syms = entry[0]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            entry[0] = out
    assert got == want


@settings(**SETTINGS)
@given(
    st.lists(
        st.text(alphabet=st.sampled_from("xy z"), min_size=0, max_size=40),
        min_size=1,
        max_size=5,
    ),
    st.integers(min_value=2, max_value=4),
)
def test_dup_span_merged_invariants(spark, texts, n):
    """Structural invariants on random corpora: spans cover at least n
    tokens each, never exceed the doc, and the longest fits the total."""
    from data_engineering_assignment_spark.operators.corpus import (
        dup_span_merged_stats,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for r in dup_span_merged_stats(df, n=n).collect():
        assert 0 <= r["dup_tokens"] <= r["n_tokens"]
        assert r["longest_span"] <= r["dup_tokens"]
        assert r["dup_tokens"] >= n * r["n_spans"] or r["n_spans"] == 0
        if r["n_spans"]:
            assert r["longest_span"] >= n


@settings(**SETTINGS)
@given(st.integers(min_value=0, max_value=200))
def test_token_budget_bounds(spark, budget):
    """Budget bounds: the kept token mass reaches the budget (crossing doc
    included) without exceeding budget + one doc, and never exceeds the
    corpus."""
    from data_engineering_assignment_spark.operators.llmprep import (
        token_budget_sample,
    )

    rows = [(i, "s", " ".join(f"t{i}w{j}" for j in range(1 + i % 5)))
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    r = token_budget_sample(df, {"s": budget}).collect()[0]
    max_doc = 5
    if budget <= 0:
        assert r["n_kept"] == 0 and r["tokens_kept"] == 0
    else:
        assert r["tokens_kept"] >= min(budget, r["tokens_total"])
        assert r["tokens_kept"] < budget + max_doc
        assert r["tokens_kept"] <= r["tokens_total"]
