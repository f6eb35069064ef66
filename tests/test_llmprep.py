"""LLM-prep operator tests: deterministic sampling/mixing, decontamination,
PII redaction, sequence packing, repetition stats."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_assignment_spark.operators.llmprep import (
    decontaminate,
    hash_bucket,
    hash_sample,
    mix_sources,
    pack_sequences,
    redact_pii,
    repetition_stats,
)


def docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, source string, text string")


def test_hash_sample_deterministic_and_proportional(spark):
    df = docs(spark, [(i, "s", f"document number {i} with some words") for i in range(400)])
    a = sorted(r["doc_id"] for r in hash_sample(df, 25).collect())
    b = sorted(r["doc_id"] for r in hash_sample(df.repartition(7), 25).collect())
    assert a == b  # partitioning-independent
    assert 0.15 * 400 < len(a) < 0.35 * 400  # ~25%


def test_hash_bucket_range(spark):
    df = docs(spark, [(i, "s", f"text {i}") for i in range(50)])
    buckets = [r["b"] for r in df.select(hash_bucket("text").alias("b")).collect()]
    assert all(0 <= b < 100 for b in buckets)


def test_mix_sources_rates(spark):
    rows = [(i, f"src{i % 2}", f"mixed corpus doc {i} alpha beta") for i in range(600)]
    df = docs(spark, rows)
    kept = mix_sources(df, {"src0": 100, "src1": 0}).groupBy("source").count().collect()
    by_src = {r["source"]: r["count"] for r in kept}
    assert by_src.get("src0") == 300  # 100% kept
    assert "src1" not in by_src  # 0% kept


def test_mix_sources_default_rate(spark):
    df = docs(spark, [(i, "unlisted", f"doc {i} gamma delta") for i in range(300)])
    n = mix_sources(df, {"src0": 100}, default_pct=50).count()
    assert 0.3 * 300 < n < 0.7 * 300


def test_decontaminate_finds_shared_ngrams(spark):
    bench = docs(spark, [(100, "b", "the quick brown fox jumps over the lazy dog")])
    train = docs(
        spark,
        [
            (1, "t", "intro text then the quick brown fox jumps right here"),
            (2, "t", "completely unrelated content about query engines today"),
        ],
    )
    out = {r["doc_id"]: r["n_shared_shingles"] for r in decontaminate(train, bench).collect()}
    assert 1 in out and out[1] >= 1  # shares "the quick brown fox jumps"
    assert 2 not in out


def test_redact_pii_counts_and_replaces(spark):
    df = docs(spark, [(1, "s", "mail a.user@example.com or b@x.org, call 555-0199 now")])
    row = redact_pii(df).collect()[0]
    assert row["n_emails"] == 2 and row["n_phones"] == 1
    assert "<EMAIL>" in row["redacted"] and "<PHONE>" in row["redacted"]
    assert "example.com" not in row["redacted"] and "555-0199" not in row["redacted"]


def test_pack_sequences_capacity_bins(spark):
    # 5 docs of 4 tokens each, capacity 8 → packs of 2 docs (contiguous)
    rows = [(i, "en", "w x y z") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    out = {r["doc_id"]: r["pack_id"] for r in pack_sequences(df, 8, group_col="lang").collect()}
    assert out == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2}


def test_pack_sequences_oversized_doc_gets_own_pack(spark):
    rows = [(0, "en", " ".join(["t"] * 20)), (1, "en", "a b")]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    out = {r["doc_id"]: r["pack_id"] for r in pack_sequences(df, 8, group_col="lang").collect()}
    assert out[0] == 0 and out[1] == 2  # 20 tokens before doc 1 → bin 2


def test_repetition_stats_values(spark):
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "w x y z")], "doc_id bigint, text string"
    )
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert out[1]["n_tokens"] == 4 and out[1]["n_uniq"] == 2
    assert out[1]["top_tok_share"] == 0.75 and out[1]["uniq_ratio"] == 0.5
    assert out[2]["uniq_ratio"] == 1.0 and out[2]["top_tok_share"] == 0.25


def test_quality_percentile_gate_integer_cut(spark):
    from data_engineering_assignment_spark.operators.llmprep import (
        quality_percentile_gate,
    )

    # 5 docs in one source → top 80% keeps exactly 4 (rank*100 <= 5*80)
    rows = [(i, "s1", q) for i, q in enumerate([0.9, 0.8, 0.7, 0.6, 0.5])]
    rows += [(10, "s2", 0.3)]  # singleton source: 1*100 <= 1*80 is false → kept 0
    df = spark.createDataFrame(rows, "doc_id bigint, source string, quality double")
    out = {r["source"]: r for r in quality_percentile_gate(df, 80).collect()}
    assert out["s1"]["n_docs"] == 5 and out["s1"]["n_kept"] == 4
    assert out["s1"]["min_kept_quality"] == 0.6
    assert out["s2"]["n_kept"] == 0 and out["s2"]["min_kept_quality"] is None


def test_quality_percentile_gate_ties_and_bucket_edges(spark):
    """The histogram-pruned formulation must survive heavy ties (the k-th
    largest value repeated across the cut) and values that land exactly on
    bucket boundaries."""
    from data_engineering_assignment_spark.operators.llmprep import (
        quality_percentile_gate,
    )

    rows = [(i, "t", 0.5) for i in range(10)]  # all tied: k=8, q* = 0.5
    rows += [(100 + i, "e", q) for i, q in enumerate([0.01, 0.01, 0.02, 0.02, 0.03])]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, quality double")
    out = {r["source"]: r for r in quality_percentile_gate(df, 80).collect()}
    assert out["t"]["n_kept"] == 8 and out["t"]["min_kept_quality"] == 0.5
    # "e": 5 docs, k=4, desc order (.03,.02,.02,.01,.01) → 4th largest = 0.01
    assert out["e"]["n_kept"] == 4 and out["e"]["min_kept_quality"] == 0.01


def test_quality_percentile_gate_excludes_null_quality(spark):
    """NULL-quality docs are excluded up front: from n_docs, the cut, and
    min_kept_quality — a NULL bucket absorbing the target rank would
    otherwise yield min_kept_quality NULL (the r5 advice finding)."""
    from data_engineering_assignment_spark.operators.llmprep import (
        quality_percentile_gate,
    )

    rows = [(i, "s", q) for i, q in enumerate([0.9, 0.8, 0.7, 0.6, 0.5])]
    rows += [(10 + i, "s", None) for i in range(5)]  # half the source is NULL
    df = spark.createDataFrame(rows, "doc_id bigint, source string, quality double")
    out = {r["source"]: r for r in quality_percentile_gate(df, 80).collect()}
    # identical to the 5-doc non-null case: NULLs invisible to every output
    assert out["s"]["n_docs"] == 5 and out["s"]["n_kept"] == 4
    assert out["s"]["min_kept_quality"] == 0.6


def test_pack_sequences_sharded_single_language(spark):
    """shards_per_group splits one language's packing into independent
    deterministic subgroups: every shard's packs respect capacity exactly,
    pack ids never collide across shards, and the assignment is stable
    under repartitioning."""
    from data_engineering_assignment_spark.operators.llmprep import pack_sequences

    rows = [(i, "en", "tok " * (i % 7 + 1)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    out = pack_sequences(df, 16, shards_per_group=4).collect()
    assert len(out) == 200
    # reconstruct per-pack token totals: each pack obeys the capacity
    # discipline (a pack exceeds 16 only via its own last doc, i.e. the
    # cumulative count BEFORE each doc is < its pack's upper bound)
    by_pack: dict = {}
    for r in out:
        by_pack.setdefault(r["pack_id"], []).append((r["doc_id"], r["n_tokens"]))
    shards = {p >> 40 for p in by_pack}
    assert shards == {0, 1, 2, 3}  # ids are shard-offset, no collisions
    for pack, docs in by_pack.items():
        docs.sort()
        running = 0
        for _, n in docs:
            assert running < 16 or running == 0  # doc starts before the cap
            running += n
    # deterministic under repartitioning
    again = pack_sequences(df.repartition(7), 16, shards_per_group=4).collect()
    assert sorted((r["doc_id"], r["pack_id"]) for r in again) == sorted(
        (r["doc_id"], r["pack_id"]) for r in out
    )
    # unsharded path unchanged: one contiguous packing for the language
    flat = pack_sequences(df, 16).collect()
    assert max(r["pack_id"] for r in flat) < 1 << 40


def test_dsir_affinity_ranks_target_like_docs_first(spark):
    """Docs sharing the target domain's n-gram profile outrank docs that
    don't; rnk is a 1..k dense prefix with doc_id tie-breaks."""
    from data_engineering_assignment_spark.operators.llmprep import (
        dsir_affinity_topk,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha beta", "tgt"),
            (2, "alpha beta gamma", "tgt"),
            (10, "alpha beta alpha", "raw"),   # target-like
            (11, "delta epsilon zeta", "raw"), # disjoint vocabulary
            (12, "beta alpha", "raw"),         # target-like
        ],
        "doc_id long, text string, source string",
    )
    got = dsir_affinity_topk(docs, ["tgt"], k=5).collect()
    assert [r["rnk"] for r in got] == [1, 2, 3, 4, 5]
    by_doc = {r["doc_id"]: r for r in got}
    # the disjoint-vocabulary doc scores below every target-like doc
    assert all(
        by_doc[11]["affinity"] < by_doc[d]["affinity"] for d in (1, 2, 10, 12)
    )


def test_dsir_affinity_partitioning_independent(spark, sf_dir):
    """Scores (decimal-detour sums) and ranks are identical across input
    partitionings."""
    from data_engineering_assignment_spark.operators.llmprep import (
        dsir_affinity_topk,
    )
    from data_engineering_assignment_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    a = [tuple(r) for r in dsir_affinity_topk(docs, ["src0", "src1"], k=16).collect()]
    b = [
        tuple(r)
        for r in dsir_affinity_topk(docs.repartition(7), ["src0", "src1"], k=16).collect()
    ]
    assert a == b and len(a) == 16


def test_intra_doc_repetition_hand_computed(spark):
    """Gopher intra-doc signals on hand-countable fixtures: duplicate
    paragraph fractions (every occurrence counts), top-n-gram char mass,
    and the clean-doc zero case."""
    from data_engineering_assignment_spark.operators.llmprep import (
        intra_doc_repetition,
    )

    loop = " ".join(["a b c d"] * 4)          # 16 tokens = 4 identical 4-blocks
    clean = "w x y z p q r s"                 # 8 tokens, no repetition
    docs = spark.createDataFrame(
        [(1, loop), (2, clean)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in intra_doc_repetition(docs, para_tokens=4).collect()
    }
    r1 = got[1]
    # 4 identical paragraphs "a b c d": all 4 are duplicates
    assert r1["n_paras"] == 4
    assert r1["dup_para_frac"] == 1.0
    assert r1["dup_para_char_frac"] == 1.0
    # top bigram "d a" or "a b"... : "a b","b c","c d" x4, "d a" x3 ->
    # max count 4, chars 3 -> 12 / len(text)=31
    assert r1["top_bigram_char_frac"] == round(12 / 31, 4)
    # top trigram: "a b c" x4 (5 chars) -> 20/31
    assert r1["top_trigram_char_frac"] == round(20 / 31, 4)
    r2 = got[2]
    assert r2["n_paras"] == 2
    assert r2["dup_para_frac"] == 0.0 and r2["dup_para_char_frac"] == 0.0
    # all bigrams unique: top mass = 1 occurrence * 3 chars = 3/15
    assert r2["top_bigram_char_frac"] == 0.2


def test_intra_doc_repetition_short_and_empty_docs(spark):
    """Docs too short for an n-gram report 0 fraction; empty text guards
    every division."""
    from data_engineering_assignment_spark.operators.llmprep import (
        intra_doc_repetition,
    )

    docs = spark.createDataFrame(
        [(1, "solo"), (2, "")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in intra_doc_repetition(docs).collect()}
    assert got[1]["top_bigram_char_frac"] == 0.0
    assert got[1]["dup_para_frac"] == 0.0
    assert got[2]["top_bigram_char_frac"] == 0.0
    assert got[2]["dup_para_char_frac"] == 0.0


def test_token_budget_sample_exact_prefix(spark):
    """The kept set is the exact greedy hash-order prefix: crossing doc
    included, budget >= total keeps all, budget <= 0 keeps none, and the
    histogram-pruned plan matches a brute-force cumulative computed in
    the test."""
    from pyspark.sql import functions as F

    from data_engineering_assignment_spark.operators.llmprep import (
        token_budget_sample,
    )
    from data_engineering_assignment_spark.operators.text import rolling_hash

    rows = [
        (i, f"src{i % 3}", " ".join(f"w{i}x{j}" for j in range(3 + i % 7)))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    budgets = {"src0": 60, "src1": 10_000, "src2": 0}
    got = {
        r["source"]: (r["budget"], r["n_docs"], r["tokens_total"],
                      r["n_kept"], r["tokens_kept"])
        for r in token_budget_sample(df, budgets).collect()
    }

    # brute force: global (h, id) order per source
    ordered = (
        df.select(
            "source", "doc_id",
            F.size(F.split("text", " ")).cast("long").alias("nt"),
            rolling_hash("text").alias("h"),
        )
        .orderBy("h", "doc_id")
        .collect()
    )
    import collections
    want = collections.defaultdict(lambda: [0, 0, 0, 0])  # docs, toks, kept, keptt
    for r in ordered:
        b = budgets[r["source"]]
        st = want[r["source"]]
        if st[1] < b:
            st[2] += 1
            st[3] += r["nt"]
        st[0] += 1
        st[1] += r["nt"]
    for src, st in want.items():
        assert got[src] == (budgets[src], st[0], st[1], st[2], st[3]), src
    assert got["src2"][3] == 0          # zero budget keeps nothing
    assert got["src1"][3] == got["src1"][1]  # huge budget keeps all docs


def test_token_budget_sample_partitioning_independent(spark):
    """Same kept counts under any input partitioning (the deterministic-
    order contract)."""
    from data_engineering_assignment_spark.operators.llmprep import (
        token_budget_sample,
    )

    rows = [(i, "s", " ".join(f"t{i}_{j}" for j in range(4))) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    a = token_budget_sample(df, {"s": 300}).collect()[0]
    b = token_budget_sample(df.repartition(13), {"s": 300}).collect()[0]
    assert (a["n_kept"], a["tokens_kept"]) == (b["n_kept"], b["tokens_kept"])
    assert a["tokens_kept"] >= 300  # crossing doc included


def test_intra_doc_repetition_plan_single_tokenize_and_generate(spark):
    """The let-binding + Generate shape: the token split appears exactly
    once in the executed plan (HOFs are interpreted — no codegen CSE —
    so every extra occurrence is a full per-row re-tokenize), and the
    packed struct crosses a Generate so CollapseProject cannot inline it
    into the six output columns."""
    from data_engineering_assignment_spark.operators.llmprep import (
        intra_doc_repetition,
    )

    df = spark.createDataFrame(
        [(1, "a b c d a b c d"), (2, "x y z")], "doc_id long, text string"
    )
    out = intra_doc_repetition(df, para_tokens=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("split(text") == 1
    assert plan.count("Generate") == 1


def test_gopher_quality_flags_rules(spark):
    """Each Gopher rule fires on a targeted fixture and the clean doc
    passes all seven (integer cross-multiplication thresholds)."""
    from data_engineering_assignment_spark.operators.llmprep import (
        gopher_quality_flags,
    )

    clean = " ".join(["the quick brown fox of and lore"] * 8)  # 56 words
    docs = [
        ("clean", clean),
        ("short", "the of tiny doc"),  # < 50 words
        ("shouty", clean + " " + " ".join(["#"] * 20)),  # symbol ratio
        ("bullets", ("- b\n" * 19) + clean),  # 19/20 lines bulleted
        ("dots", ("x...\n" * 2) + clean),  # 2/3 lines end ...
        ("digits", clean + " " + " ".join(["123"] * 20)),  # alpha < 80%
        ("tiny-words", " ".join(["a b c d e f g"] * 8)),  # mean len < 3
        ("no-stop", " ".join(["lorem ipsum dolor sit amet xyzzy"] * 9)),
    ]
    df = spark.createDataFrame(docs, "name string, text string")
    got = {r.name: r.asDict() for r in gopher_quality_flags(df).collect()}
    c = got["clean"]
    assert c["gopher_pass"] and all(
        c[k] for k in got["clean"] if k.startswith("rule_")
    )
    assert not got["short"]["rule_word_count"]
    assert not got["shouty"]["rule_symbol_ratio"]
    assert not got["bullets"]["rule_bullet_lines"]
    assert not got["dots"]["rule_ellipsis_lines"]
    assert not got["digits"]["rule_alpha_words"]
    assert not got["tiny-words"]["rule_mean_word_len"]
    assert not got["no-stop"]["rule_stopwords"]
    for name in docs[1:]:
        assert not got[name[0]]["gopher_pass"]


def test_hashed_multiclass_scores(spark):
    """Multi-class classifier: per-class integer scores are exact sums
    of bucket weights, label is argmax with ties to the
    lexicographically GREATEST class, and the plan evaluates the
    rolling hash ONCE per token (let-bound across the per-class
    lookups)."""
    from data_engineering_assignment_spark.operators.llmprep import (
        hashed_multiclass_scores,
    )
    from data_engineering_assignment_spark.operators.text import (
        ROLLING_BASE,
        ROLLING_MOD,
    )

    def rh(tok):
        h = 0
        for ch in tok:
            h = (h * ROLLING_BASE + ord(ch)) % ROLLING_MOD
        return h

    n = 8
    w = {
        "aa": [10 * i for i in range(n)],
        "bb": [7 * i + 1 for i in range(n)],
        "zz": [10 * i for i in range(n)],  # ties 'aa' everywhere
    }
    docs = [(1, "alpha beta gamma"), (2, "x"), (3, "")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in hashed_multiclass_scores(df, w).collect()}
    for did, text in docs:
        toks = text.split(" ")
        exp = {c: sum(w[c][rh(t) % n] for t in toks) for c in w}
        r = got[did]
        assert (r.score_aa, r.score_bb, r.score_zz) == (
            exp["aa"], exp["bb"], exp["zz"],
        ), did
        best = max(exp.values())
        want_label = max(c for c in exp if exp[c] == best)
        assert r.label == want_label, (did, r.label, want_label)
    # 'aa' and 'zz' are identical: every tie must resolve to 'zz'
    assert all(r.label in ("bb", "zz") for r in got.values())
    plan = (
        hashed_multiclass_scores(df, w)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("aggregate(") == 1  # one rolling-hash fold total


def test_hashed_multiclass_char_features(spark):
    """features='char': scores are exact integer sums over the char
    2/3-gram hash stream (python-replayed), documents shorter than
    min(char_ns) emit no row, and unknown feature families raise."""
    import pytest

    from data_engineering_assignment_spark.operators.llmprep import (
        hashed_multiclass_scores,
    )
    from data_engineering_assignment_spark.operators.text import (
        ROLLING_BASE,
        ROLLING_MOD,
    )

    def rh(s):
        h = 0
        for ch in s:
            h = (h * ROLLING_BASE + ord(ch)) % ROLLING_MOD
        return h

    def grams(text, n_buckets):
        t2 = text.replace(" ", "_")
        for nn in (2, 3):
            for i in range(len(t2) - nn + 1):
                yield rh(" ".join(t2[i : i + nn])) % n_buckets

    n = 16
    w = {
        "aa": [11 * i - 40 for i in range(n)],
        "bb": [5 * i + 3 for i in range(n)],
    }
    docs = [(1, "中文内容"), (2, "ab cd"), (3, "x"), (4, "")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in hashed_multiclass_scores(df, w, features="char").collect()
    }
    assert set(got) == {1, 2}  # <2 chars -> no features -> no row
    for did, text in docs[:2]:
        exp = {c: sum(w[c][b] for b in grams(text, n)) for c in w}
        assert (got[did].score_aa, got[did].score_bb) == (
            exp["aa"],
            exp["bb"],
        ), did
        best = max(exp.values())
        assert got[did].label == max(c for c in exp if exp[c] == best)
    with pytest.raises(ValueError, match="feature family"):
        hashed_multiclass_scores(df, w, features="subword")


def test_cjk_char_model_beats_word_model_held_out(spark):
    """The point of the char feature family (lang_classifier_cjk_gate):
    on digit ranges OUTSIDE the training sample, the word-bucket model
    mislabels a large fraction of unsegmented-script docs (each CJK
    line is one giant unseen token) while the char 2/3-gram model stays
    perfect — fastText lid's reason for char n-grams, reproduced on the
    gate's own trained-by-construction weights."""
    from data_engineering_assignment_spark.operators.llmprep import (
        hashed_multiclass_scores,
    )
    from data_engineering_assignment_spark.operators.text import (
        ROLLING_BASE,
        ROLLING_MOD,
    )
    from data_engineering_assignment_spark.queries.catalog_llm import (
        _CJK_WEIGHTS,
        _cjk_fixture_text,
    )

    def rh(s):
        h = 0
        for ch in s:
            h = (h * ROLLING_BASE + ord(ch)) % ROLLING_MOD
        return h

    n = len(_CJK_WEIGHTS["en"])
    # word-bucket twin trained the same way on the same k=0..99 sample
    word_w = {}
    for cls in _CJK_WEIGHTS:
        hit = {
            rh(t) % n
            for k in range(100)
            for t in _cjk_fixture_text(k, cls).split(" ")
        }
        word_w[cls] = [400 if b in hit else -100 for b in range(n)]
    held_out = [
        (i, cls, _cjk_fixture_text(k, cls))
        for i, (k, cls) in enumerate(
            (k, cls) for k in range(100, 140) for cls in ("zh", "th")
        )
    ]
    df = spark.createDataFrame(
        [(i, t) for i, _, t in held_out], "doc_id long, text string"
    )
    char_lbl = {
        r.doc_id: r.label
        for r in hashed_multiclass_scores(
            df, _CJK_WEIGHTS, features="char"
        ).collect()
    }
    word_lbl = {
        r.doc_id: r.label
        for r in hashed_multiclass_scores(df, word_w).collect()
    }
    char_wrong = sum(1 for i, cls, _ in held_out if char_lbl[i] != cls)
    word_wrong = sum(1 for i, cls, _ in held_out if word_lbl[i] != cls)
    assert char_wrong == 0
    assert word_wrong >= len(held_out) // 3  # measured 45/80 offline


def test_gopher_whitespace_runs_not_words(spark):
    """Runs of spaces / blank lines are separators, not zero-length
    'words': n_words counts real tokens only, so the alpha-word and
    mean-word-length fractions match the published Gopher tokenization
    on multi-space text (r12 advisor finding)."""
    from data_engineering_assignment_spark.operators.llmprep import (
        gopher_quality_flags,
    )

    base = " ".join(["the quick brown fox of and lore"] * 8)  # 56 words
    spaced = base.replace(" ", "   ") + "\n\n\n" + "tail words here"
    df = spark.createDataFrame(
        [("plain", base + " tail words here"), ("spaced", spaced)],
        "name string, text string",
    )
    got = {r.name: r.asDict() for r in gopher_quality_flags(df).collect()}
    assert got["spaced"]["n_words"] == got["plain"]["n_words"] == 59
    for k, v in got["plain"].items():
        if k.startswith("rule_") or k == "gopher_pass":
            assert got["spaced"][k] == v, k
    assert got["spaced"]["gopher_pass"]
