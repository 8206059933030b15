"""Mid-plan materialization with a cluster-safe switch.

Several operators materialize an intermediate frame to truncate
lineage: iterative algorithms (dedup_clusters' label propagation,
bpe_train's merge rounds) re-join a frame every round and would
otherwise replay the whole upstream DAG per iteration; snapshot
read-modify-write paths (incremental band/gram-count state, the corpus
pipeline's stage boundaries) must sever from a warehouse version they
are about to supersede.

``localCheckpoint`` is the fast local default — but it stores blocks on
executors WITHOUT lineage, so on a real cluster a lost executor kills
the job mid-iteration (VERDICT r4 finding on dedup_clusters; the same
exposure applied to every other call site, which is why this lives in
one module now). ``durable=True`` switches to reliable ``checkpoint()``
into the fault-tolerant checkpoint directory (HDFS/S3 on a cluster) so
iteration survives executor loss; set
``spark.cleaner.referenceTracking.cleanCheckpoints=true`` to reap
superseded round files. The 100 TB posture is durable; the local
default keeps tests fast.

Deployments flip the mode session-wide with
``spark.graft.durableCheckpoint=true`` instead of threading a flag
through every operator (the round-5 ``spark.dedupClusters.
durableCheckpoint`` key is honored as an alias).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DURABLE_CONF = "spark.graft.durableCheckpoint"
# round-5 introduced the switch on dedup_clusters only, under this key;
# kept as an alias so existing deployments don't silently lose the mode
LEGACY_DURABLE_CONF = "spark.dedupClusters.durableCheckpoint"


def materialize(df: DataFrame, durable: bool | None = None) -> DataFrame:
    """Materialize ``df`` and truncate its lineage.

    ``durable=None`` (the default) reads the session confs above
    (``"true"``/``"false"``, absent = false). ``durable=True`` requires
    ``spark.sparkContext.setCheckpointDir(<fault-tolerant dir>)`` and
    refuses loudly without it — a silent localCheckpoint fallback would
    defeat the reason a deployment set the conf.
    """
    if durable is None:
        conf = df.sparkSession.conf
        durable = (
            conf.get(DURABLE_CONF, conf.get(LEGACY_DURABLE_CONF, "false"))
            or "false"
        ).lower() == "true"
    if durable:
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            raise ValueError(
                "durable checkpointing requires "
                "spark.sparkContext.setCheckpointDir(<fault-tolerant dir>)"
            )
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
