"""Multi-executor realism probe (r08 verdict task 8, env-gated).

Everything else in the suite certifies on ``local[N]``, where all
"executors" share one JVM and one BlockManager — which silently forgives
assumptions local mode can't expose: localCheckpoint blocks are always
process-local, broadcasts never cross a wire, exchange reuse never sees
a remote fetch, and Python workers all fork from one daemon.  This
module re-runs the operators most dependent on those mechanics under
``local-cluster[2,4,4096]`` (2 separate worker JVMs × 4 cores × 4 GiB)
and asserts bit-identical results vs the oracle-certified answers.

Gated behind ``SPARK_GRAFT_LOCAL_CLUSTER=1``: local-cluster mode boots
real worker JVMs (slow, ~30 s), must own the only Spark session in the
process, and is a close-out/stress check rather than an every-run
gate.  Run explicitly::

    SPARK_GRAFT_LOCAL_CLUSTER=1 python -m pytest tests/test_local_cluster.py -q
"""

from __future__ import annotations

import os

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_LOCAL_CLUSTER") != "1",
    reason="local-cluster probe is opt-in (SPARK_GRAFT_LOCAL_CLUSTER=1); "
    "boots 2 real worker JVMs and must own the process's only session",
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lc_spark():
    from pyspark.sql import SparkSession

    from bakery_big_data_spark.session import RUNTIME_CONF

    builder = (
        SparkSession.builder.appName("local-cluster-probe")
        .master("local-cluster[2,4,4096]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    # Ship the package to the worker JVMs' Python workers, exactly as a
    # real submit does with --py-files: cloudpickle serializes
    # module-level functions (e.g. the WAV decode kernels referenced by
    # mapInPandas closures) BY REFERENCE, so the remote workers must be
    # able to import bakery_big_data_spark — local[N] masks this because
    # its workers inherit the driver's sys.path.
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )  # repo root
    staging = tempfile.mkdtemp(prefix="lc-pyfiles-")
    zip_path = shutil.make_archive(
        os.path.join(staging, "bakery_big_data_spark"),
        "zip",
        root_dir=pkg_dir,
        base_dir="bakery_big_data_spark",
    )
    spark.sparkContext.addPyFile(zip_path)
    yield spark
    spark.stop()
    shutil.rmtree(staging, ignore_errors=True)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_connected_components_chain_across_executors(lc_spark):
    """Iterative min-label propagation with per-round localCheckpoint
    cuts: under local-cluster the checkpointed blocks live on two
    separate BlockManagers, so every round's join exercises remote block
    fetches that local[N] can never produce."""
    from pyspark.sql import functions as F

    from bakery_big_data_spark.operators.dedup import connected_components

    chain = lc_spark.createDataFrame(
        [(i, i + 1) for i in range(8)], ["id_a", "id_b"]
    )
    nodes = lc_spark.range(9).select(F.col("id").alias("node"))
    got = {
        (r.node, r.canonical_id)
        for r in connected_components(nodes, chain, "node", max_iter=20).collect()
    }
    assert got == {(i, 0) for i in range(9)}


def test_reliable_checkpoint_mode_across_executors(lc_spark, tmp_path):
    """checkpoint_dir mode writes each round to shared storage — the
    production cluster path; must equal the localCheckpoint answer."""
    from pyspark.sql import functions as F

    from bakery_big_data_spark.operators.dedup import connected_components

    chain = lc_spark.createDataFrame(
        [(i, i + 1) for i in range(8)], ["id_a", "id_b"]
    )
    nodes = lc_spark.range(9).select(F.col("id").alias("node"))
    got = {
        (r.node, r.canonical_id)
        for r in connected_components(
            nodes, chain, "node", max_iter=20, checkpoint_dir=str(tmp_path)
        ).collect()
    }
    assert got == {(i, 0) for i in range(9)}


def test_catalog_queries_match_single_jvm_answers(lc_spark):
    """Representative catalog queries (broadcast star join, bucketed
    colocated join, flagship agg, LSH dedup pairs, BPE merge loop) give
    byte-identical answers under 2 real executors as under local[N] —
    exercising remote broadcasts, cross-JVM shuffles, bucketed scan
    planning, and Arrow Python workers on separate worker JVMs."""
    from bakery_big_data_spark.plans import REGISTRY

    names = [
        "pricing_summary_quality_gated",
        "join_multiway_star",
        "bucketed_colocated_join",
        "dedup_minhash_lsh_pairs",
        "bpe_vocab_merges",
        "quality_configured_gate",
    ]
    # expected answers come from the DuckDB-oracle-certified plans
    # themselves executed on this session — the assertion here is that
    # execution SUCCEEDS under multi-executor scheduling and returns the
    # same multiset a fresh second run returns (plan determinism across
    # executor placement); cross-checking against the oracle suite's
    # sf0.001 answers is the existing test_catalog.py job.
    for name in names:
        df1 = REGISTRY[name].build(lc_spark, SF_DIR)
        r1 = _rows(df1)
        r2 = _rows(REGISTRY[name].build(lc_spark, SF_DIR))
        assert r1 == r2, f"{name}: nondeterministic across runs"
        assert len(r1) > 0, f"{name}: empty result under local-cluster"


def test_streaming_gate_under_local_cluster(lc_spark, tmp_path):
    """The streaming dedup ingest gate's foreachBatch state commits and
    band-index joins run with executors on separate JVMs."""
    from bakery_big_data_spark.streaming.dedup_gate import (
        run_streaming_dedup_gate,
    )

    dec = run_streaming_dedup_gate(
        lc_spark, SF_DIR, str(tmp_path / "gate"), n_chunks=2
    )
    n = dec.count()
    assert n > 0


def test_driver_window_sweep_under_local_cluster(lc_spark):
    """r09 verdict task 6: EVERY driver-window row, driver-exact oracle
    compare (row count + schema + order-insensitive value multiset), under
    2 real worker JVMs — so exchange reuse, remote broadcasts, cross-JVM
    block fetches and forked Python workers are exercised on each row the
    driver will certify this round.  sf0.001 keeps the sweep minutes-sized;
    the single-JVM oracle compare at sf0.01/sf0.1 is bench.py --verify's
    job.  SPARK_GRAFT_LOCAL_CLUSTER_FULL=1 widens the sweep to the WHOLE
    catalog (one-off realism audit; ~3x the wall)."""
    from bakery_big_data_spark.plans import DRIVER_WINDOW, REGISTRY
    from tests.oracle import compare, duck_connect

    names = (
        list(REGISTRY)
        if os.environ.get("SPARK_GRAFT_LOCAL_CLUSTER_FULL") == "1"
        else DRIVER_WINDOW
    )
    con = duck_connect(SF_DIR)
    failures = []
    for name in names:
        q = REGISTRY[name]
        try:
            compare(q.build(lc_spark, SF_DIR), con, q.oracle)
        except Exception as exc:  # collect all, report once
            failures.append(f"{name}: {type(exc).__name__}: {str(exc)[:160]}")
    con.close()
    assert not failures, "\n".join(failures)


def _executor_pids() -> list[int]:
    """PIDs of the CoarseGrainedExecutorBackend JVMs (NOT the Worker
    supervisors, NOT this driver) — scanned from /proc, no pgrep dep."""
    pids = []
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        try:
            with open(f"/proc/{entry}/cmdline", "rb") as fh:
                cmd = fh.read().replace(b"\0", b" ")
        except OSError:
            continue
        if b"CoarseGrainedExecutorBackend" in cmd:
            pids.append(int(entry))
    return pids


def test_executor_kill_mid_query_still_driver_exact(lc_spark, tmp_path):
    """Fault-tolerance probe: SIGKILL one of the two executor JVMs while
    an iterative reliable-checkpoint connected-components job is running,
    and assert the answer is still exact.

    This is the claim a 1000-executor cluster actually relies on: task
    retry + stage reattempt + FetchFailed recovery reproduce the SAME
    result because every plan is deterministic (no rand(), no
    layout-dependent sampling), and checkpoint_dir mode keeps iterative
    lineage cuts on shared storage so a lost executor's blocks are
    re-READ, not unrecoverable (localCheckpoint's documented trade-off,
    operators/checkpointing.py).  The standalone Worker relaunches the
    killed executor, so subsequent tests see a healthy cluster."""
    import signal
    import threading
    import time

    from pyspark.sql import functions as F

    from bakery_big_data_spark.operators.dedup import connected_components

    before = _executor_pids()
    assert len(before) >= 2, f"expected 2 executor JVMs, saw {before}"

    # 200 disjoint 21-node chains: diameter 20 keeps hop-propagation
    # convergent within max_iter while ~20 iterative rounds leave a wide
    # window for the kill to land mid-job
    seg, n = 21, 200 * 21
    chain = (
        lc_spark.range(n - 1)
        .filter((F.col("id") + 1) % seg != 0)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
        .repartition(8)
    )
    nodes = lc_spark.range(n).select(F.col("id").alias("node"))

    result: dict = {}

    def run() -> None:
        try:
            result["rows"] = {
                (r.node, r.canonical_id)
                for r in connected_components(
                    nodes,
                    chain,
                    "node",
                    max_iter=30,
                    checkpoint_dir=str(tmp_path / "ckpt"),
                ).collect()
            }
        except Exception as exc:  # surfaced by the main thread's assert
            result["err"] = exc

    worker = threading.Thread(target=run)
    worker.start()
    # Kill as soon as a job is actually in flight (ADVICE r10): polling
    # the status tracker instead of a fixed sleep means the fault lands
    # mid-job on any hardware speed; if the whole 30-round job somehow
    # completes before a kill window opens, skip rather than fail.
    tracker = lc_spark.sparkContext.statusTracker()
    deadline = time.time() + 30.0
    while time.time() < deadline and worker.is_alive():
        if tracker.getActiveJobsIds():
            break
        time.sleep(0.05)
    if not worker.is_alive():
        pytest.skip("job completed before a kill window opened — no fault injected")
    killed = before[0]
    os.kill(killed, signal.SIGKILL)
    worker.join(timeout=600)
    assert not worker.is_alive(), "query hung after executor kill"
    assert "err" not in result, f"query failed after executor kill: {result.get('err')}"
    assert result["rows"] == {(i, i - i % seg) for i in range(n)}

    # the Worker supervisor must have relaunched the executor
    deadline = time.time() + 60
    while time.time() < deadline:
        alive = _executor_pids()
        if killed not in alive and len(alive) >= 2:
            break
        time.sleep(1.0)
    assert len(_executor_pids()) >= 2, "killed executor was not relaunched"


def test_semantic_gate_append_log_under_local_cluster(lc_spark, tmp_path):
    """r12: the semantic gate's APPEND-LOG state (Δ-sized append_commit /
    multi-path read_log segments / demotion-record fold) must produce the
    exact single-JVM certified decision table when the per-batch probe
    matmul and the log reads/writes run on two separate worker JVMs —
    remote shuffle fetches, cross-JVM Arrow workers, and segment files
    written by different executors."""
    import duckdb

    from bakery_big_data_spark.plans import REGISTRY
    from bakery_big_data_spark.streaming.dedup_gate import (
        run_streaming_semantic_gate,
    )

    dec = {
        tuple(r)
        for r in run_streaming_semantic_gate(
            lc_spark, SF_DIR, str(tmp_path / "semgate"), n_chunks=3
        ).collect()
    }
    assert len(dec) > 0
    # exact compare vs the DuckDB oracle of the registered row (the
    # same decision-table SQL the driver hashes)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    oracle = {
        (int(a), int(b), bool(k))
        for a, b, k in con.execute(
            REGISTRY["streaming_semantic_ingest_gate"].oracle
        ).fetchall()
    }
    got = {(int(a), int(b), bool(k)) for a, b, k in dec}
    assert got == oracle, (
        "append-log gate decisions diverge from the certified oracle "
        "under local-cluster"
    )
