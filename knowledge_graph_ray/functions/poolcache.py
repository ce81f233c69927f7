"""Task-pool map_batches with a per-worker-process callable cache.

For stages whose callable state is CHEAP to build (compiled regexes,
hash-permutation params) an actor pool is the wrong shape: a fresh pool
costs ~2-4s startup latency that can dominate a sub-second stage.  A
plain task pool with the callable constructed once per worker PROCESS
(not per batch) keeps the state-reuse property and scales elastically.

Keep real actor pools for stages whose setup is genuinely expensive
(model weights, external clients) — see stages/extract.extract_mentions.
"""

from __future__ import annotations

_PROCESS_CACHE: dict = {}


def cached_class_map(ds, cls, batch_size: int = 1024, **ctor_kwargs):
    """map_batches(cls(**ctor_kwargs)) as a task pool, constructing the
    callable once per worker process."""
    cache_key = (cls.__module__, cls.__qualname__,
                 repr(sorted(ctor_kwargs.items())))

    def body(batch):
        fn = _PROCESS_CACHE.get(cache_key)
        if fn is None:
            fn = _PROCESS_CACHE[cache_key] = cls(**ctor_kwargs)
        return fn(batch)

    return ds.map_batches(body, batch_format="pyarrow", batch_size=batch_size)


def materialize_concurrently(datasets: list):
    """Materialize independent Datasets in parallel driver threads.

    Ray Data executes one streaming DAG per materialize() call; driving
    two independent DAGs (e.g. entity and relationship canonicalization,
    which both scan the pinned mentions) from separate threads overlaps
    their shuffles instead of idling the cluster between barriers.
    """
    import concurrent.futures

    with concurrent.futures.ThreadPoolExecutor(len(datasets)) as ex:
        return list(ex.map(lambda d: d.materialize(), datasets))


def run_concurrently(thunks: list):
    """Run independent dataset-producing thunks in parallel driver
    threads (each thunk typically builds a pipeline and materializes
    it).  Unlike ``materialize_concurrently`` this also overlaps
    driver-side probes inside the thunk (size gates, to_pandas pulls),
    not just the final materialize."""
    import concurrent.futures

    with concurrent.futures.ThreadPoolExecutor(len(thunks)) as ex:
        return list(ex.map(lambda f: f(), thunks))
