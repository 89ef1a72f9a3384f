"""Dedup operators: exact, MinHash-LSH, SimHash, embedding LSH."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from receipt_scanner_spark.operators.dedup import (
    embedding_near_dup_candidates,
    exact_dedup_df,
    minhash_lsh_candidates,
    simhash_candidates,
    simhash_signatures,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    """Real documents + planted near-duplicates and exact duplicates."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
    pdf = docs.toPandas()
    planted = []
    for i in range(10):  # near-dups: change ONE word at the end
        src = pdf.iloc[i]
        planted.append(
            dict(doc_id=10_000 + i, text=src.text + " zzz", lang=src.lang,
                 source=src.source, n_chars=src.n_chars + 4)
        )
    for i in range(5):  # exact dups modulo whitespace
        src = pdf.iloc[i]
        planted.append(
            dict(doc_id=20_000 + i, text="  " + src.text.replace(" ", "  ") + " ",
                 lang=src.lang, source=src.source, n_chars=src.n_chars)
        )
    return spark.createDataFrame(pd.concat([pdf, pd.DataFrame(planted)]))


class TestExactDedup:
    def test_whitespace_normalized_dups_removed(self, spark, docs_with_dups):
        out = exact_dedup_df(docs_with_dups)
        assert out.count() == 110  # 100 + 10 near-dups survive; 5 exact dups drop
        # keeper is the MIN doc_id of each group
        assert out.filter(F.col("doc_id") >= 20_000).count() == 0


class TestMinHashLSH:
    def test_planted_near_dups_found(self, spark, docs_with_dups):
        pairs = minhash_lsh_candidates(docs_with_dups).toPandas()
        found = {(a, b) for a, b in zip(pairs.id_a, pairs.id_b)}
        # every planted near-dup pair (i, 10000+i) must be a candidate
        for i in range(10):
            assert (i, 10_000 + i) in found, f"missed pair {i}"
        # exact dups are trivially candidates too
        for i in range(5):
            assert (i, 20_000 + i) in found
        # candidate volume stays near the true-dup count (LSH, not n^2):
        # 115 docs -> 6555 possible pairs; candidates must be < 3%
        assert len(found) < 200, len(found)

    def test_deterministic(self, spark, docs_with_dups):
        p1 = sorted(map(tuple, minhash_lsh_candidates(docs_with_dups).collect()))
        p2 = sorted(map(tuple, minhash_lsh_candidates(docs_with_dups).collect()))
        assert p1 == p2


class TestSimHash:
    def test_signatures_deterministic_and_stable(self, spark, docs_with_dups):
        s1 = dict(simhash_signatures(docs_with_dups).collect())
        s2 = dict(simhash_signatures(docs_with_dups).collect())
        assert s1 == s2
        # near-dup docs have close simhashes (small Hamming distance)
        for i in range(10):
            x = s1[i] ^ s1[10_000 + i]
            assert bin(x & 0xFFFFFFFFFFFFFFFF).count("1") <= 8, i

    def test_candidates_include_planted(self, spark, docs_with_dups):
        pairs = simhash_candidates(docs_with_dups).toPandas()
        found = {(a, b) for a, b in zip(pairs.id_a, pairs.id_b)}
        hits = sum((i, 10_000 + i) in found for i in range(10))
        assert hits >= 8, f"simhash banding found only {hits}/10 planted pairs"
        ham = {(a, b): h for a, b, h in zip(pairs.id_a, pairs.id_b, pairs.hamming)}
        assert all(v >= 0 for v in ham.values())


class TestEmbeddingLSH:
    @pytest.fixture(scope="class")
    def vectors(self, spark):
        rng = np.random.default_rng(7)
        base = rng.standard_normal((50, 64)).astype(np.float32)
        rows = [
            dict(vec_id=i, embedding=[float(x) for x in base[i]]) for i in range(50)
        ]
        for i in range(8):  # planted near-dups: tiny perturbation
            v = base[i] + rng.standard_normal(64).astype(np.float32) * 0.01
            rows.append(dict(vec_id=1000 + i, embedding=[float(x) for x in v]))
        return spark.createDataFrame(pd.DataFrame(rows))

    def test_planted_neighbors_found(self, spark, vectors):
        pairs = embedding_near_dup_candidates(
            vectors, n_planes=10, min_cosine=0.95
        ).toPandas()
        found = {(a, b) for a, b in zip(pairs.id_a, pairs.id_b)}
        hits = sum((i, 1000 + i) in found for i in range(8))
        assert hits >= 7, f"embedding LSH found only {hits}/8"
        # verified cosine is high for all reported pairs
        assert (pairs.cosine >= 0.95).all()

    def test_random_pairs_not_reported(self, spark, vectors):
        pairs = embedding_near_dup_candidates(
            vectors, n_planes=10, min_cosine=0.95
        ).toPandas()
        bogus = {(a, b) for a, b in zip(pairs.id_a, pairs.id_b)
                 if b < 1000}  # two unrelated random vectors
        assert not bogus


def test_shingles_boundary_whitespace_matches_oracle(spark):
    """Round-2 self-review regression: a leading/trailing non-space
    whitespace char yields an EMPTY boundary token in the oracle's
    regexp_split_to_array(TRIM(...), '\\s+') (TRIM strips spaces only),
    so shingles like ' foo bar' exist.  The batched UDF must reproduce
    them exactly."""
    import duckdb

    from receipt_scanner_spark.operators.dedup import word_shingles_udf

    texts = [
        "\tfoo bar baz",          # leading tab -> empty boundary token
        "foo bar baz\n",          # trailing newline
        "  foo bar baz  ",        # spaces only: TRIMmed, no empty token
        "\t\tfoo  bar\r\nbaz qux\f",
        "a b",                    # under 3 tokens
        "",
        "\t",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    from pyspark.sql import functions as F

    got = {
        r["doc_id"]: sorted(r["sh"])
        for r in df.select(
            "doc_id", word_shingles_udf(3)(F.col("text")).alias("sh")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    want_rows = con.execute(r"""
        WITH words AS (
          SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS w
          FROM t
        )
        SELECT doc_id, LIST(DISTINCT w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])
        FROM words, UNNEST(range(GREATEST(LEN(w) - 2, 0))) AS u(i)
        GROUP BY doc_id
    """).fetchall()
    want = {doc_id: sorted(sh) for doc_id, sh in want_rows}
    for i in range(len(texts)):
        assert got[i] == want.get(i, []), (i, texts[i], got[i], want.get(i))
