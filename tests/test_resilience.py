"""Fault tolerance: a Ray Data pipeline must survive the loss of a
worker process mid-stage (the 100TB reality — at 256 nodes, workers
die).  The UDF hard-kills its process (os._exit) exactly once via a
filesystem sentinel; Ray's task retry reruns the lost block and the
pipeline completes with exact results."""

import os
import uuid

import pandas as pd
import pyarrow as pa
import ray.data as rd


def test_pipeline_survives_worker_loss(tmp_path_factory):
    sentinel = str(tmp_path_factory.mktemp("chaos") / f"{uuid.uuid4()}.die")

    def body(batch: pa.Table) -> pa.Table:
        # first task to arrive takes the poison: creates the sentinel,
        # then kills its whole worker process (not an exception — a
        # crash, which Ray retries; UDF exceptions correctly abort)
        try:
            fd = os.open(sentinel, os.O_CREAT | os.O_EXCL)
            os.close(fd)
            os._exit(1)
        except FileExistsError:
            pass
        return pa.table({
            "x": batch.column("id"),
            "y": pa.compute.multiply(batch.column("id"), 2),
        })

    ds = rd.range(10_000).repartition(8).map_batches(
        body, batch_format="pyarrow")
    out = ds.to_pandas().sort_values("x").reset_index(drop=True)
    assert len(out) == 10_000
    assert (out["y"].to_numpy() == out["x"].to_numpy() * 2).all()
    assert os.path.exists(sentinel)  # the kill really happened
