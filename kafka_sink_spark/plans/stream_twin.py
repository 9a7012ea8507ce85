"""Shared harness for the REAL availableNow streaming-twin queries.

Five catalog queries certify a streaming operator by actually executing it:
stage a parquet snapshot into a temp dir, read it back as a file stream,
run the operator, sink to an in-memory table with ``trigger(availableNow=
True)``, and return the (post-processed) sink contents for the driver's
oracle comparison.  The shared tail of that pattern lives here so every
twin gets the same termination and cleanup discipline:

* ``awaitTermination(timeout)`` returns a BOOLEAN — ``q.exception()`` is
  None on a slow-but-healthy query, so ignoring the boolean would read the
  memory sink mid-flight and silently return undercounted state.  A False
  return stops the query and raises.
* The returned DataFrame is materialized with an eager ``localCheckpoint``
  BEFORE the staged source dir, the checkpoint dir, and the memory-sink
  temp view are torn down, so the caller's later ``.collect()`` cannot
  observe deleted inputs.
"""

from __future__ import annotations

import shutil
from typing import Iterable


def finish_stream_twin(spark, query, view_name, result_df, tmp_dirs: Iterable[str]):
    """Await an availableNow twin ``query``, materialize ``result_df``,
    then drop the memory-sink view ``view_name`` and remove ``tmp_dirs``.

    Returns the eagerly checkpointed result (safe to collect after
    cleanup).  Raises ``TimeoutError`` if the replay does not finish
    within the 300 s budget, and re-raises the query's own failure if it
    terminated with one.
    """
    try:
        if not query.awaitTermination(300):
            query.stop()
            raise TimeoutError(
                f"streaming twin {view_name!r} did not finish within 300s"
            )
        if query.exception() is not None:
            raise query.exception()
        out = result_df.localCheckpoint(eager=True)
    finally:
        for d in tmp_dirs:
            shutil.rmtree(d, ignore_errors=True)
        try:
            spark.catalog.dropTempView(view_name)
        except Exception:
            # never mask the original failure with view-cleanup noise
            pass
    return out
