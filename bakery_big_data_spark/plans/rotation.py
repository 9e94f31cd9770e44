"""Standing driver-window rotation policy (r11 verdict task 5).

The correctness driver verifies the FIRST ~50 registrations each round.
Through r11 the window was hand-planned per round (``R11_ROTATION_PLAN``
drained the never-driver-checked backlog to zero).  With the backlog at
zero the policy below replaces per-round planning:

1. **Anchors stay.**  :data:`ANCHOR_ROWS` — the flagship, the medallion
   family, and one representative per §2 capability cluster / LLM family
   — hold a slot every round, so a regression in a core surface is
   caught the same round it lands.
2. **New registrations enter the window the round they are born** (the
   r11 discipline: a query is registered AND driver-certified in the
   same round; nothing re-enters a backlog).
3. **Remaining slots rotate oldest-certification-first**: the non-anchor
   rows whose most recent green driver CORRECTNESS row is oldest get the
   slots, ties broken alphabetically.  At ~161 rotating rows and ~30
   slots per round every row's driver certification is re-freshed within
   a bounded ~5-6 round staleness horizon.

``DRIVER_WINDOW`` in ``plans/__init__.py`` stays a static list (the
registration order is a driver contract and must not depend on artifact
files at import time); :func:`compute_rotation` regenerates it each
round from the committed ``CORRECTNESS_r*.json`` artifacts, and
``tests/test_catalog.py`` asserts the static list equals the policy's
output for the pinned :data:`ROTATION_AS_OF` round — so the list cannot
silently drift from the policy, and artifacts landing AFTER the pin
(e.g. this round's own correctness run) cannot retroactively break the
assertion.
"""

from __future__ import annotations

import glob
import json
import os
import re

#: Artifact horizon the committed DRIVER_WINDOW was computed from: only
#: CORRECTNESS_r{N}.json with N <= ROTATION_AS_OF participate.  Bump this
#: (and regenerate DRIVER_WINDOW via compute_rotation) once per round.
ROTATION_AS_OF = 13

#: Permanent window residents — flagship + medallion + one anchor per §2
#: capability cluster and LLM-pipeline family (the r11 veteran set).
ANCHOR_ROWS: list[str] = [
    # flagship (P1-P11 + §2.11 quality fold)
    "pricing_summary_quality_gated",
    # medallion family (incl. SCD2 carrying J4/S11)
    "medallion_ml_features",
    "medallion_gold_daily_fact",
    "medallion_dim_user_scd2",
    # aggregation / union / dashboard anchors (A2/A6/A10, U1/U2, §2.12)
    "report_quality_multi_table",
    "dashboard_summary",
    # joins (J1-J8) + SQL surface (S9/J5)
    "join_multiway_star",
    "sql_exists_subquery",
    # windows (W1/W2)
    "window_sequence_keys",
    # scalar functions (§2.8)
    "json_variant_shred",
    # IO / scan-pruning anchors (S4/S7/S12/S13)
    "partition_pruned_scan",
    "csv_ddl_roundtrip",
    # streaming core (S1-S3, T2-T4, stateful sessions)
    "streaming_ingest_replay",
    "streaming_stateful_sessions",
    # LLM families: text profile, MinHash recall bound, ingest gate
    "text_analysis_profile",
    "dedup_minhash_recall",
    "streaming_dedup_ingest_gate",
]

WINDOW_SIZE = 50


def certification_ledger(
    artifacts_dir: str | None = None, as_of: int = ROTATION_AS_OF
) -> dict[str, int]:
    """``{query_name: latest round with a green driver row}`` from the
    committed ``CORRECTNESS_r*.json`` artifacts with round <= ``as_of``.
    Green = ``hash_match`` true (the value-certified gate; rows-only
    records don't count as certification)."""
    if artifacts_dir is None:
        artifacts_dir = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
    ledger: dict[str, int] = {}
    for path in sorted(
        glob.glob(os.path.join(artifacts_dir, "CORRECTNESS_r*.json"))
    ):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m or int(m.group(1)) > as_of:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        rows = data.get("queries", data)
        if not isinstance(rows, dict):
            continue
        for name, rec in rows.items():
            if isinstance(rec, dict) and rec.get("hash_match"):
                ledger[name] = max(ledger.get(name, 0), rnd)
    return ledger


def compute_rotation(
    registry_names: list[str],
    artifacts_dir: str | None = None,
    as_of: int = ROTATION_AS_OF,
    size: int = WINDOW_SIZE,
) -> list[str]:
    """The policy's window for the round AFTER ``as_of``: anchors first,
    then never-certified registrations (newborns, alphabetical), then
    oldest-certification-first (ties alphabetical) until ``size``."""
    ledger = certification_ledger(artifacts_dir, as_of)
    names = set(registry_names)
    anchors = [n for n in ANCHOR_ROWS if n in names]
    rest = sorted(
        (n for n in names if n not in set(anchors)),
        key=lambda n: (ledger.get(n, -1), n),
    )
    return (anchors + rest)[:size]
