"""Shared-subtree materialization for multi-branch operators.

Several operators (the near-dup cap paths, connected components) read one
intermediate DataFrame from several downstream branches. Catalyst does NOT
reuse exchanges across DataFrame branches (measured in r4: zero
ReusedExchange — the upstream subtree re-executed per branch), so these
operators materialize the shared subtree once. ``mode`` picks the trade:

* ``"local"`` (default): ``localCheckpoint`` — fastest; pins the blocks to
  EXECUTOR storage with no lineage to recompute them, so an executor loss
  mid-job makes downstream stages unrecoverable (the job fails and must be
  rerun). Also semi-eager: the checkpoint job runs at call time. Right for
  on-demand/retryable batch jobs.
* ``"reliable"``: ``df.checkpoint`` to the cluster checkpoint directory
  (``spark.sparkContext.setCheckpointDir`` must be set, ideally to a
  replicated FS) — survives executor loss; costs one FS write+read of the
  materialized rows. Right for spot/preemptible fleets (ADVICE r4).
* ``"none"``: no materialization — pure lazy lineage, fully fault-
  tolerant, but the shared subtree re-executes once per consuming branch
  (measured slower). Also what the plan-shape tests use to see the whole
  lineage in one plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

MATERIALIZE_MODES = ("local", "reliable", "none")


def materialize(df: DataFrame, mode: str = "local") -> DataFrame:
    if mode == "local":
        return df.localCheckpoint(eager=True)
    if mode == "reliable":
        return df.checkpoint(eager=True)
    if mode == "none":
        return df
    raise ValueError(f"materialize mode must be one of {MATERIALIZE_MODES}, got {mode!r}")
