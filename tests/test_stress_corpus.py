"""Stress-corpus generator invariants (sources/stress.py).

The ×K corpus exists to time the catalog at sf1-equivalent scale WITHOUT
reintroducing artificial duplicate content (which would turn a 10× corpus
into a 100× candidate-pair corpus for every dedup/ANN row).  These tests
pin the decorrelation guarantees with DuckDB only — no Spark session.
"""

import duckdb
import pytest

from bakery_big_data_spark.sources import stress

SRC = "/root/testdata/sf0.001/embeddings.parquet"


def _replica_embedding(k: int):
    con = duckdb.connect()
    sql = stress._replica_sql("embeddings", SRC, k)
    row = con.execute(
        f"SELECT embedding FROM ({sql}) ORDER BY vec_id LIMIT 1"
    ).fetchone()
    con.close()
    return row[0]


def test_embedding_shift_never_degenerates_at_k_ge_dim():
    """Replica k=64 (== embedding dim) must NOT be an exact copy of the
    base vectors: a raw shift of 64 slices an empty head and clamps the
    tail to the whole list (the ADVICE r09 finding); the folded shift
    keeps every replica k >= 1 a genuine rotation."""
    base = _replica_embedding(0)
    for k in (1, 63, 64, 65, 99):
        shifted = _replica_embedding(k)
        assert shifted != base, f"replica {k} degenerated to an exact copy"
        # rotation preserves the multiset of coordinates exactly
        assert sorted(shifted) == sorted(base)


def test_embedding_shift_fold_is_never_zero_mod_dim():
    for k in range(1, 200):
        shift = ((k - 1) % 63) + 1
        assert 1 <= shift <= 63
        assert shift % 64 != 0


def test_replica_key_stride_preserves_disjoint_ids():
    con = duckdb.connect()
    sql0 = stress._replica_sql("embeddings", SRC, 0)
    sql1 = stress._replica_sql("embeddings", SRC, 1)
    n = con.execute(
        f"SELECT COUNT(*) FROM ({sql0}) a JOIN ({sql1}) b USING (vec_id)"
    ).fetchone()[0]
    con.close()
    assert n == 0
