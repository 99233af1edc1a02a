"""Hypothesis property tests for the generic round-4 algorithms:
exclusive_cumsum (any ordered keyed values, any level width) and the
z-order bit interleave (exact round-trip vs a Python model). These are
the two operators whose correctness is an ALGORITHM property, not a
fixture behavior — randomized inputs catch the off-by-one classes
(empty parts, gap keys, width boundaries) a fixed fixture never hits.

Example counts stay small: every example runs Spark jobs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from labelmain_spark.functions.packing import exclusive_cumsum
from labelmain_spark.labelstore.zorder import zorder_key

_ROWS = st.lists(
    st.tuples(st.integers(0, 1_000_000), st.integers(0, 500)),
    min_size=1,
    max_size=50,
    unique_by=lambda t: t[0],
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_ROWS, width=st.sampled_from([2, 7, 1024]))
def test_cumsum_matches_serial_model(spark, rows, width):
    """Exclusive prefix sums equal the serial model for arbitrary key
    gaps, values, and level widths (width=2 forces deep recursion)."""
    df = spark.createDataFrame(rows, "k long, v long")
    got = dict(
        exclusive_cumsum(df, "k", "v", "off", width=width)
        .select("k", "off")
        .collect()
    )
    spark.catalog.clearCache()
    acc = 0
    for k, v in sorted(rows):
        assert got[k] == acc, f"key {k} (width {width}): {got[k]} != {acc}"
        acc += v


def _interleave(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, (1 << 16) - 1), st.integers(0, (1 << 16) - 1)),
        min_size=1,
        max_size=100,
    )
)
def test_zorder_key_matches_model(spark, pairs):
    df = spark.createDataFrame(pairs, "a long, b long")
    got = [
        r.z
        for r in df.select(zorder_key(F.col("a"), F.col("b")).alias("z")).collect()
    ]
    want = [_interleave(a, b) for a, b in pairs]
    assert got == want


def test_remove_duplicate_spans_conserves_tokens(spark, sf_dir):
    """Cross-engine equality can't catch a shared blind spot: assert
    against ground truth that (kept + removed) equals each document's
    true token count and that no doc is lost."""
    from labelmain_spark.functions.substrings import remove_duplicate_spans
    from labelmain_spark.sources.readers import load_table

    got = {
        r.doc_id: (r.n_tokens, r.n_removed)
        for r in remove_duplicate_spans(spark, sf_dir).collect()
    }
    true_counts = {
        r.doc_id: r.n
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    assert set(got) == set(true_counts)
    for doc_id, (n_tokens, n_removed) in got.items():
        assert n_tokens == true_counts[doc_id], doc_id
        assert 0 <= n_removed <= n_tokens
    spark.catalog.clearCache()


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n_tokens=st.lists(st.integers(min_value=1, max_value=300), min_size=1, max_size=8)
)
def test_chunk_count_matches_closed_form(spark, n_tokens):
    """chunk_documents' closed-form chunk count and boundaries must
    match a serial reference chunker for arbitrary doc lengths,
    including the n == W, n == W+1 and n < W edge cells."""
    from labelmain_spark.functions.chunking import CHUNK_S, CHUNK_W, chunk_documents
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile
    import os

    docs = [(i, " ".join(f"t{i}_{j}" for j in range(n))) for i, n in enumerate(n_tokens)]
    with tempfile.TemporaryDirectory() as tmp:
        tbl = pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
                "lang": pa.array(["en"] * len(docs), pa.string()),
                "source": pa.array(["src0"] * len(docs), pa.string()),
                "n_chars": pa.array([len(t) for _, t in docs], pa.int64()),
                "url": pa.array([""] * len(docs), pa.string()),
            }
        )
        pq.write_table(tbl, os.path.join(tmp, "documents.parquet"))
        got: dict = {}
        for r in chunk_documents(spark, tmp).collect():
            got.setdefault(r.doc_id, []).append((r.chunk_id, r.n_tokens))
    for doc_id, n in enumerate(n_tokens):
        toks = docs[doc_id][1].split(" ")
        expect, i = [], 0
        while True:
            win = toks[i * CHUNK_S : i * CHUNK_S + CHUNK_W]
            expect.append((i, len(win)))
            if i * CHUNK_S + CHUNK_W >= len(toks):
                break
            i += 1
        assert sorted(got[doc_id]) == expect, (doc_id, n)


def test_decontaminate_spans_matches_python_reference(spark, sf_dir):
    """THIRD independent algorithm: a serial pure-Python
    decontaminator (n-gram tuples as identity — no hashing at all)
    must reproduce every train doc's (n_tokens, n_removed,
    clean_text) exactly. The Spark plan decides membership on the
    dual-lane xxhash64 pair and the DuckDB oracle on md5 text — this
    reference has no hash to collide, so agreement rules out a
    shared hash-identity blind spot, and it exercises the islands
    merge against naive per-position coverage."""
    from labelmain_spark.functions.contamination import (
        CONTAM_EVAL_BP,
        DECON_N,
        decontaminate_spans,
    )
    from labelmain_spark.functions.sampling import _hash_bp_expr
    from labelmain_spark.sources.readers import load_table

    docs = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    # the split predicate itself is Spark-evaluated: this test checks
    # the span algebra, not the (sampling-suite-tested) hash split
    eval_ids = {
        r.doc_id
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.expr(_hash_bp_expr("doc_id", "spark")) < CONTAM_EVAL_BP)
        .select("doc_id")
        .collect()
    }
    bench = {
        tuple(toks[i : i + DECON_N])
        for did, toks in docs.items()
        if did in eval_ids
        for i in range(len(toks) - DECON_N + 1)
    }
    want = {}
    for did, toks in docs.items():
        if did in eval_ids:
            continue
        covered = set()
        for i in range(len(toks) - DECON_N + 1):
            if tuple(toks[i : i + DECON_N]) in bench:
                covered.update(range(i, i + DECON_N))
        clean = " ".join(t for i, t in enumerate(toks) if i not in covered)
        want[did] = (len(toks), len(covered), clean)

    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in decontaminate_spans(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    mismatches = {d: (got[d], want[d]) for d in want if got[d] != want[d]}
    assert not mismatches, dict(list(mismatches.items())[:3])
    assert any(n_removed > 0 for _, n_removed, _ in got.values()), (
        "fixture exercises no contamination — the test is vacuous"
    )
    spark.catalog.clearCache()
