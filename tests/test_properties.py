"""Property-based tests (hypothesis): operator semantics checked against
independent reference implementations on randomized small inputs, plus
empty-input edges. Example counts are kept low — every example pays a
Spark job — but shrinkage still pinpoints minimal failing cases."""

import pandas as pd
import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from semantic_index_spark.operators import timeseries as TS

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


events = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),          # key
        st.integers(min_value=0, max_value=50),  # ts
        st.integers(min_value=0, max_value=9),   # value
    ),
    min_size=0,
    max_size=12,
)


@given(left=events, right=events)
@settings(**SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    """asof_join == pandas merge_asof(direction='backward') after
    deterministic per-(key, ts) right-side dedup (keep max value)."""
    lrows = [(k, t, i, float(v)) for i, (k, t, v) in enumerate(left)]
    rbase = pd.DataFrame(right, columns=["k", "ts", "v"])
    rbase = (
        rbase.groupby(["k", "ts"], as_index=False)["v"].max()
        if len(rbase)
        else pd.DataFrame(columns=["k", "ts", "v"])
    )
    ldf = spark.createDataFrame(
        lrows or [("zz", -1, -1, 0.0)], "k string, ts int, lid int, lv double"
    )
    rdf = spark.createDataFrame(
        [(r.k, int(r.ts), float(r.v)) for r in rbase.itertuples()] or [("zz", -1, 0.0)],
        "k string, ts int, v double",
    )
    got = {
        r["lid"]: r["v_asof"]
        for r in TS.asof_join(ldf, rdf, on="k", value_cols=["v"]).collect()
    }
    # reference: pandas merge_asof per key
    lpd = pd.DataFrame(lrows, columns=["k", "ts", "lid", "lv"]).sort_values("ts")
    if lrows:
        rpd = rbase.astype({"ts": "int64"}).sort_values("ts")
        exp = pd.merge_asof(
            lpd, rpd.rename(columns={"v": "v_ref"}), on="ts", by="k", direction="backward"
        )
        for row in exp.itertuples():
            ref = None if pd.isna(row.v_ref) else float(row.v_ref)
            assert got.get(row.lid) == ref, (row.lid, got.get(row.lid), ref)


@given(
    items=st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=8),
    batch=st.lists(st.sampled_from(["a", "b", "e", "f"]), min_size=0, max_size=6),
)
@settings(**SETTINGS)
def test_duplicate_policy_invariants(spark, items, batch):
    """UPDATE: store keys = old ∪ batch, each once. SKIP: store keys
    unchanged ∪ genuinely-new, old embeddings kept. ALLOW: count grows by
    exactly len(batch)."""
    from semantic_index_spark import SemanticIndex
    from semantic_index_spark.duplicate_handling import DuplicateHandling
    from semantic_index_spark.embedder import DeterministicEmbedder

    def fresh():
        ix = SemanticIndex(spark, embedder=DeterministicEmbedder(dim=4))
        if items:
            ix.add_range(items, DuplicateHandling.ALLOW)
        return ix

    upd = fresh()
    if batch:
        upd.add_range(batch, DuplicateHandling.UPDATE)
    upd_keys = sorted(r["item"] for r in upd.records.select("item").distinct().collect())
    assert upd_keys == sorted({f'"{x}"' for x in set(items) | set(batch)})

    allow = fresh()
    n0 = allow.count()
    if batch:
        allow.add_range(batch, DuplicateHandling.ALLOW)
    assert allow.count() == n0 + len(batch)

    skip = fresh()
    if batch:
        skip.add_range(batch, DuplicateHandling.SKIP)
    skip_keys = {r["item"] for r in skip.records.select("item").distinct().collect()}
    assert skip_keys == {f'"{x}"' for x in set(items) | set(batch)}


def test_empty_inputs_through_operators(spark):
    """Operators must be total on empty inputs — no exceptions, zero rows."""
    from semantic_index_spark.operators import dedup as D
    from semantic_index_spark.operators import similarity as S
    from semantic_index_spark.operators.text_analysis import chunk_documents, tfidf_top_terms

    docs = spark.createDataFrame([], "doc_id long, text string")
    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert D.exact_dedup(docs).count() == 0
    assert D.minhash_lsh_pairs(docs, num_hashes=4, bands=4).count() == 0
    assert D.ngram_jaccard_pairs(docs, threshold=0.1).count() == 0
    assert D.simhash(docs, bits=8).count() == 0
    assert S.topk(emb, [0.0, 1.0], k=5).count() == 0
    assert chunk_documents(docs).count() == 0
    assert tfidf_top_terms(docs).count() == 0
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert D.connected_components(docs.select("doc_id"), pairs).count() == 0


texts = st.lists(
    st.text(
        alphabet=st.sampled_from("ab @.+-019\t\né"), min_size=0, max_size=40
    ),
    min_size=1,
    max_size=8,
)


@given(ts=texts)
@settings(**SETTINGS)
def test_text_signal_bounds_and_scrub_safety(spark, ts):
    """repetition_ratio ∈ [0,1]; pii_scrub output never contains a raw
    email match; scrubbing is idempotent (placeholders don't re-match)."""
    import re

    from semantic_index_spark.functions import text as T

    df = spark.createDataFrame([(t,) for t in ts], "text string")
    rows = df.select(
        T.repetition_ratio("text").alias("rr"),
        T.pii_scrub("text").alias("s1"),
        T.pii_scrub(T.pii_scrub("text")).alias("s2"),
    ).collect()
    email = re.compile(dict(T.PII_PATTERNS)["EMAIL"])
    for r in rows:
        assert 0.0 <= r["rr"] <= 1.0
        assert not email.search(r["s1"])
        assert r["s2"] == r["s1"]


@given(
    vals=st.lists(
        st.floats(min_value=-50, max_value=150, allow_nan=False), min_size=1, max_size=30
    )
)
@settings(**SETTINGS)
def test_histogram_bins_partition_all_rows(spark, vals):
    """Bin counts always sum to the row count (clamping loses nothing),
    and every bin index is within [0, bins)."""
    from semantic_index_spark.functions import sketch as SKT

    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    rows = SKT.histogram_bins(df, "v", 0.0, 100.0, bins=8).collect()
    assert sum(r["n"] for r in rows) == len(vals)
    assert all(0 <= r["bin"] < 8 for r in rows)


@given(n=st.integers(min_value=1, max_value=400))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_hll_register_invariants(spark, n):
    """rho ∈ [1, 49]; register count ≤ min(n, 4096); estimate > 0."""
    from semantic_index_spark.functions import sketch as SKT

    df = spark.range(n).select(F.col("id").alias("k"))
    regs = SKT.hll_registers(df, "k").collect()
    assert len(regs) <= min(n, 4096)
    assert all(1 <= r["rho"] <= 49 for r in regs)
    est = SKT.hll_count_distinct(df, "k").collect()[0][0]
    assert est > 0


# ------------------------------------------------- salted join row identity


salted_big = st.lists(
    st.tuples(
        st.sampled_from([None, "a", "b", "c"]),   # join key (nullable)
        st.sampled_from([None, 0, 1, 2, 3, 4]),   # row_key (nullable!)
        st.integers(min_value=0, max_value=99),   # payload
    ),
    min_size=0,
    max_size=12,
)
salted_small = st.lists(
    st.tuples(
        st.sampled_from([None, "a", "b", "d"]),   # join key (nullable)
        st.integers(min_value=0, max_value=9),    # dim attr
    ),
    min_size=0,
    max_size=6,
)


@given(big=salted_big, small=salted_small, how=st.sampled_from(["inner", "left"]))
@settings(**SETTINGS)
def test_salted_join_row_identical_to_plain_join(spark, big, small, how):
    """salted_join must be ROW-IDENTICAL to the plain equi-join for both
    inner and left, including NULL join keys (never match, SQL semantics)
    and NULL row_keys (salt must still be computed — md5(NULL) is NULL and
    an unfixed salt would silently drop those rows' matches)."""
    from semantic_index_spark.operators import skew as SK

    def norm(rows):  # rows contain NULLs — sort None-safely
        return sorted(
            (tuple(r) for r in rows),
            key=lambda t: tuple((x is None, x) for x in t),
        )

    b = spark.createDataFrame(big, "k string, rk int, payload int")
    s = spark.createDataFrame(small, "k string, attr int")
    got = norm(
        SK.salted_join(b, s, on="k", row_key="rk", salt_n=4, how=how)
        .select("k", "rk", "payload", "attr").collect()
    )
    want = norm(b.join(s, ["k"], how).select("k", "rk", "payload", "attr").collect())
    assert got == want


# ------------------------------------- global ranks partition-count invariance


@given(
    n=st.integers(min_value=1, max_value=60),
    parts=st.sampled_from([1, 2, 5, 8]),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_global_ranks_deterministic_across_partition_counts(spark, n, parts):
    """global_ranks must assign the SAME rank to the same row regardless of
    the partition count (range-boundary placement), and match the
    single-reducer row_number() window it replaces."""
    from pyspark.sql import Window

    from semantic_index_spark.operators import skew as SK

    df = spark.range(n).select(
        (F.col("id") * 37 % 41).alias("v"), F.col("id").alias("uid")
    )
    got = {
        (r["v"], r["uid"]): r["rank"]
        for r in SK.global_ranks(df, ["v", "uid"], partitions=parts).collect()
    }
    want = {
        (r["v"], r["uid"]): r["rank"]
        for r in df.withColumn(
            "rank", F.row_number().over(Window.orderBy("v", "uid"))
        ).collect()
    }
    assert got == want


# ------------------------------------------- native session window semantics


sess_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # user
        st.integers(min_value=0, max_value=40),     # ts offset (units of 600s)
    ),
    min_size=1,
    max_size=15,
)


@given(evs=sess_events)
@settings(**SETTINGS)
def test_session_window_merge_is_inclusive(spark, evs):
    """Locks F.session_window's merge rule against a Python reference:
    an event merges into the open session iff its ts <= session_end
    INCLUSIVE (gap == gap_s merges; only gap > gap_s splits) — the
    boundary the sf0.1 oracle mismatch exposed in round 4."""
    gap = 1800
    rows = [(u, t * 600) for u, t in evs]  # multiples of 600 hit the
    df = spark.createDataFrame(            # gap boundary exactly
        [(u, s) for u, s in rows], "user_id int, sec long"
    ).select("user_id", F.timestamp_seconds("sec").alias("ts"))
    got = sorted(
        (r["user_id"], r["w"]["start"].timestamp(), r["w"]["end"].timestamp(), r["n"])
        for r in df.groupBy(F.session_window("ts", f"{gap} seconds").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    # Python reference: sort per user, split only when gap STRICTLY exceeds
    want = []
    by_user = {}
    for u, s in rows:
        by_user.setdefault(u, []).append(s)
    for u, ts in by_user.items():
        ts.sort()
        start, last, n = ts[0], ts[0], 0
        for s in ts:
            if s - last > gap:
                want.append((u, float(start), float(last + gap), n))
                start, n = s, 0
            last = s
            n += 1
        want.append((u, float(start), float(last + gap), n))
    assert got == sorted(want)


# ------------------------------------------- capped top-n per group identity

capped_rows = st.lists(
    st.tuples(
        st.sampled_from(["hot", "hot", "hot", "warm", "cold"]),  # skewed group
        st.integers(min_value=0, max_value=1000),                # score
    ),
    min_size=0,
    max_size=40,
)


@given(rows=capped_rows, n=st.integers(min_value=1, max_value=5),
       salt_n=st.sampled_from([1, 3, 8]))
@settings(**SETTINGS)
def test_capped_top_n_identical_to_direct_window(spark, rows, n, salt_n):
    """capped_top_n must be ROW-IDENTICAL to the direct
    row_number() OVER (PARTITION BY g ORDER BY ...) <= n window it
    replaces, for any salt count, including hot groups far above the cap.
    uid makes the order total so both forms are deterministic."""
    from pyspark.sql import Window

    from semantic_index_spark.operators import skew as SK

    data = [(g, s, i) for i, (g, s) in enumerate(rows)]
    df = spark.createDataFrame(data, "g string, score int, uid int")
    order = [F.col("score").desc(), F.col("uid")]
    got = sorted(
        tuple(r)
        for r in SK.capped_top_n(df, ["g"], order, n=n, salt_n=salt_n)
        .select("g", "score", "uid").collect()
    )
    w = Window.partitionBy("g").orderBy(*order)
    want = sorted(
        tuple(r)
        for r in df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n).select("g", "score", "uid").collect()
    )
    assert got == want


docs_strategy = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=24),
    min_size=0,
    max_size=10,
)


@given(texts=docs_strategy, threshold=st.sampled_from([0.34, 0.5, 0.75, 1.0]))
@settings(**SETTINGS)
def test_jaccard_prefix_join_lossless_on_random_docs(spark, texts, threshold):
    """Prefix filtering must equal the brute-force O(N²) Jaccard
    definition on arbitrary token multisets — including empty strings,
    repeated tokens, and exact-threshold boundary pairs."""
    from semantic_index_spark.operators import dedup as D

    rows = [(i, t) for i, t in enumerate(texts)]
    if not rows:
        rows = [(0, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.jaccard_prefix_join(df, threshold=threshold).collect()
    }
    # independent reference: pure-Python set Jaccard over the same
    # tokenization (lower/strip, whitespace split — split('') == [''])
    import re

    def toks(t):
        return set(re.split(r"\s+", t.strip().lower()))

    want = {}
    for i, a in rows:
        for j, b in rows:
            if i < j:
                ta, tb = toks(a), toks(b)
                inter = len(ta & tb)
                jac = round(inter / (len(ta) + len(tb) - inter), 6)
                if jac >= threshold:
                    want[(i, j)] = jac
    assert got == want


@given(
    weights=st.lists(st.integers(min_value=-2, max_value=40), min_size=1, max_size=10),
    n=st.sampled_from([1, 3, 8]),
)
@settings(**SETTINGS)
def test_weighted_sample_matches_python_reference(spark, weights, n):
    """Top-n by u^(1/w) with md5-derived u: exact agreement with an
    independent Python implementation; non-positive weights never win."""
    import hashlib

    from semantic_index_spark.operators import skew as SK

    rows = [(i, float(w)) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = [r["id"] for r in SK.weighted_sample(df, "id", "w", n).collect()]
    keys = {}
    for i, w in rows:
        if w > 0:
            h = int(hashlib.md5(f"ws:{i}".encode()).hexdigest()[:15], 16)
            keys[i] = ((h + 1) / float(1 << 60)) ** (1.0 / w)
    want = [k for k, _ in sorted(keys.items(), key=lambda kv: (-kv[1], kv[0]))[:n]]
    assert sorted(got) == sorted(want)


def test_empty_inputs_through_round4_operators(spark):
    """Round-4 operators are total on empty inputs too."""
    from semantic_index_spark.operators import dedup as D
    from semantic_index_spark.operators import graph as G
    from semantic_index_spark.operators import mining as MN
    from semantic_index_spark.operators import privacy as PV
    from semantic_index_spark.operators import skew as SK
    from semantic_index_spark.operators import text_analysis as TA
    from semantic_index_spark.operators import timeseries as TS

    docs = spark.createDataFrame([], "doc_id long, text string, lang string")
    edges = spark.createDataFrame([], "src string, dst string")
    ev = spark.createDataFrame([], "ts timestamp, value double, event_type string")
    baskets = spark.createDataFrame([], "b long, i string")
    assert G.pagerank(edges, iterations=2).count() == 0
    assert G.triangle_count(edges).collect()[0]["n_triangles"] == 0
    assert MN.association_lift(baskets, "b", "i").count() == 0
    assert D.jaccard_prefix_join(docs, threshold=0.5).count() == 0
    assert D.cosine_allpairs_tfidf(docs, threshold=0.5).count() == 0
    assert D.simhash_hamming_pairs(docs, bits=16, max_hamming=2).count() == 0
    assert D.blocked_linkage(docs, "doc_id", "text", ["lang"]).count() == 0
    assert TA.term_label_pmi(docs, min_count=1).count() == 0
    assert TS.time_decayed_sum(ev, "ts", "value", "event_type", 7.0).count() == 0
    assert TS.seasonal_anomaly(ev, "ts", "event_type").count() == 0
    assert SK.weighted_sample(docs, "doc_id", "doc_id", 5).count() == 0
    assert PV.k_anonymity_audit(docs, ["lang"], k=3).count() == 0
    assert PV.dp_noisy_counts(ev, "event_type").count() == 0


baskets_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=4), st.sampled_from("wxyz")),
    min_size=0,
    max_size=20,
)


@given(rows=baskets_strategy, min_support=st.sampled_from([1, 2]))
@settings(**SETTINGS)
def test_association_lift_matches_python_reference(spark, rows, min_support):
    """Pair counts and lift equal an independent Python computation over
    basket-presence sets (multiplicity ignored, a<b canonical)."""
    from collections import Counter

    from semantic_index_spark.operators import mining as MN

    df = spark.createDataFrame(rows or [(99, "q")], "b long, i string")
    got = {
        (r["item_a"], r["item_b"]): (r["n_ab"], r["lift"])
        for r in MN.association_lift(df, "b", "i", min_support=min_support).collect()
    }
    data = rows or [(99, "q")]
    baskets = {}
    for b, i in data:
        baskets.setdefault(b, set()).add(i)
    n_baskets = len(baskets)
    marg = Counter()
    pair = Counter()
    for items in baskets.values():
        for i in items:
            marg[i] += 1
        s = sorted(items)
        for x in range(len(s)):
            for y in range(x + 1, len(s)):
                pair[(s[x], s[y])] += 1
    want = {
        p: (n, round(n * n_baskets / (marg[p[0]] * marg[p[1]]), 6))
        for p, n in pair.items()
        if n >= min_support
    }
    assert got == want


@given(
    docs=st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=30).filter(str.strip),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_segment_dedup_invariants(spark, docs):
    """Global invariants of the C4-style segment dedup on a tiny duplicate-
    rich alphabet: (1) every duplicated segment keeps EXACTLY one copy
    corpus-wide, uniques keep theirs — Σ n_kept == |distinct segments that
    appear| when min_count=2 drops all repeats; (2) n_kept <= n_segs per
    doc; (3) every input doc gets an output row."""
    from semantic_index_spark.operators import dedup as D

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = D.segment_dedup(df, n=2, min_count=2).collect()
    assert len(out) == len(rows)
    assert all(r["n_kept"] <= r["n_segs"] for r in out)
    # python reference: segment each doc the same way
    import re

    seg_occurrences = []
    for i, t in rows:
        toks = re.split(r"\s+", t.strip().lower())
        n_seg = max((len(toks) + 1) // 2, 1)
        for j in range(n_seg):
            seg_occurrences.append(" ".join(toks[j * 2 : j * 2 + 2]))
    distinct = set(seg_occurrences)
    assert sum(r["n_kept"] for r in out) == len(distinct)
    assert sum(r["n_segs"] for r in out) == len(seg_occurrences)


@given(
    changes=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),   # user
            st.integers(min_value=0, max_value=50),  # change time (sec offset)
            st.sampled_from(["a", "b", "c"]),        # attr
        ),
        min_size=1,
        max_size=20,
    ),
    probes=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),
            st.integers(min_value=0, max_value=59),  # valid seconds only
        ),
        min_size=1,
        max_size=10,
    ),
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pit_join_matches_literal_interval_join(spark, changes, probes):
    """pit_join (as-of union+window) must equal the LITERAL interval-
    containment join against the SCD2 history, including same-instant
    transitions and before-history probes."""
    import pyspark.sql.functions as SF

    ev = spark.createDataFrame(
        [(u, f"2024-01-01 00:00:{t:02d}.{i % 10}", a) for i, (u, t, a) in enumerate(changes)],
        "user_id long, ts string, attr string",
    ).withColumn("ts", SF.to_timestamp("ts"))
    hist = TS.scd2_history(ev, key="user_id", ts="ts", attr="attr", tiebreak="attr")
    facts = spark.createDataFrame(
        [(u, i, f"2024-01-01 00:00:{t:02d}") for i, (u, t) in enumerate(probes)],
        "user_id long, fact_id long, ts string",
    ).withColumn("ts", SF.to_timestamp("ts"))
    got = {
        r["fact_id"]: r["attr_pit"]
        for r in TS.pit_join(facts, hist, key="user_id", attrs=["attr"]).collect()
    }
    live = hist.filter(
        SF.col("valid_to").isNull() | (SF.col("valid_from") < SF.col("valid_to"))
    )
    truth_rows = (
        facts.alias("f")
        .join(
            live.alias("h"),
            (SF.col("f.user_id") == SF.col("h.user_id"))
            & (SF.col("h.valid_from") <= SF.col("f.ts"))
            & (SF.col("h.valid_to").isNull() | (SF.col("f.ts") < SF.col("h.valid_to"))),
            "left",
        )
        .select("f.fact_id", "h.attr")
        .collect()
    )
    truth = {r["fact_id"]: r["attr"] for r in truth_rows}
    assert len(truth_rows) == len(truth)  # containment matched at most once
    assert got == truth


# ---------------------------------------------------- round-7 lakehouse props


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 500), st.integers(0, 100)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    lo=st.integers(0, 500),
    width=st.integers(0, 100),
    nf=st.integers(1, 5),
)
@settings(**SETTINGS)
def test_prop_zonemap_skipping_never_drops_rows(spark, tmp_path_factory, rows, lo, width, nf):
    # data-skipping invariant: for ANY table layout and ANY range
    # predicate, the pruned read equals the unpruned filter
    from semantic_index_spark.sources import skipping as Z

    df = spark.createDataFrame(rows, "id bigint, v bigint")
    t = str(tmp_path_factory.mktemp("zm") / "tbl")
    Z.write_skipping(df, t, ["id"], n_files=nf, cluster_by="id")
    filt = [("id", ">=", lo), ("id", "<", lo + width)]
    got = sorted(r["id"] for r in Z.read_skipping(spark, t, filt).collect())
    ref = sorted(i for i, _ in rows if lo <= i < lo + width)
    assert got == ref


@given(
    keys=st.lists(st.integers(0, 30), min_size=0, max_size=15),
    base=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 9)),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
)
@settings(**SETTINGS)
def test_prop_deletion_vectors_equal_filter(spark, tmp_path_factory, keys, base):
    # DV semantics: read-after-delete == base minus the key set, always
    from semantic_index_spark.sources import versioned as VER

    df = spark.createDataFrame(base, "id bigint, val bigint")
    t = str(tmp_path_factory.mktemp("dv") / "tbl")
    VER.create_bucketed(df, t, ["id"], n_buckets=4)
    VER.delete_bucketed(
        spark, t, spark.createDataFrame([(k,) for k in set(keys)] or [(-1,)], "id bigint")
    )
    got = sorted(r["id"] for r in VER.read_bucketed(spark, t).collect())
    ref = sorted(i for i, _ in base if i not in set(keys))
    assert got == ref


@given(
    items=st.lists(st.integers(0, 8), min_size=1, max_size=60),
    k=st.integers(1, 6),
)
@settings(**SETTINGS)
def test_prop_mg_underestimate_and_containment(spark, items, k):
    # Misra-Gries guarantees on arbitrary streams: every stored count
    # underestimates by at most n/(k+1), and any item with true count
    # above n/(k+1) is present
    from collections import Counter

    from semantic_index_spark.functions import sketch as SKT

    df = spark.createDataFrame([(str(x),) for x in items], "v string")
    got = {r["item"]: r["cnt"] for r in SKT.mg_summary(df, "v", k=k).collect()}
    true = Counter(str(x) for x in items)
    n = len(items)
    bound = n / (k + 1)
    assert len(got) <= k
    for item, cnt in got.items():
        assert cnt <= true[item]
        assert true[item] - cnt <= bound + 1e-9
    for item, tc in true.items():
        if tc > bound:
            assert item in got


# ---------------------------------------------------------------- HNSW

hnsw_corpora = st.lists(
    st.lists(
        st.integers(min_value=-8, max_value=8),  # small ints: exact doubles
        min_size=3,
        max_size=3,
    ),
    min_size=1,
    max_size=14,
)


@given(vecs=hnsw_corpora, seed=st.integers(min_value=0, max_value=3))
@settings(**SETTINGS)
def test_hnsw_exhaustive_always_exact(spark, vecs, seed):
    """Soundness property: for ANY corpus and seed, exhaustive-mode HNSW
    over the built graph equals brute-force top-k — the connectivity
    chain + full-beam traversal can never lose a node, regardless of
    level assignment, shard split, pruning, or tie patterns."""
    from semantic_index_spark.operators import hnsw as H
    from semantic_index_spark.operators import similarity as S

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = H.build_hnsw(df, n_shards=3, m=2, ef_construction=4, seed=seed)
    q = rows[0][1]
    k = min(5, len(rows))
    got = [(r["vec_id"], r["score"]) for r in H.hnsw_topk(idx, q, k=k, ef=None).collect()]
    want = [(r["vec_id"], r["score"]) for r in S.topk(df, q, k=k).collect()]
    assert got == want
