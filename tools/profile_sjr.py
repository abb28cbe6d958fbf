"""Sub-step profile of q_streaming_join_rollup at sf0.1 (guide §1):
replay-write vs streaming-run, and per-micro-batch durations from the
query progress events."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from flink_essentials_spark import get_spark  # noqa: E402

sf = os.environ.get("SF", "/root/testdata/sf0.1")
spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")

import flink_essentials_spark.queries.catalog as cat  # noqa: E402

t0 = time.time()
df = cat.q_streaming_join_rollup(spark, sf)
t1 = time.time()
n = df.count()
t2 = time.time()
print(f"total build+run {t1-t0:.2f}s collect {t2-t1:.2f}s rows {n}")

# per-batch durations from the last query's recentProgress
for q in spark.streams.active:
    print("active", q.name)
# query already stopped; use the listener-free route: rerun with progress capture
from pyspark.sql import functions as F  # noqa: E402

progress = []


class L:
    pass


from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402


class PL(StreamingQueryListener):
    def onQueryStarted(self, e):
        pass

    def onQueryProgress(self, e):
        p = json.loads(e.progress.json)
        progress.append(p)

    def onQueryIdle(self, e):
        pass

    def onQueryTerminated(self, e):
        pass


spark.streams.addListener(PL())
t0 = time.time()
df = cat.q_streaming_join_rollup(spark, sf)
n = df.count()
t1 = time.time()
print(f"WARM rerun {t1-t0:.2f}s rows {n}, {len(progress)} batches")
time.sleep(1)
for p in progress:
    d = p.get("durationMs", {})
    print(
        f"batch {p['batchId']}: total={d.get('triggerExecution')}ms "
        f"addBatch={d.get('addBatch')}ms getBatch={d.get('getBatch')}ms "
        f"latestOffset={d.get('latestOffset')}ms "
        f"queryPlanning={d.get('queryPlanning')}ms "
        f"commit={d.get('commitOffsets')}ms walCommit={d.get('walCommit')}ms "
        f"rows={p.get('numInputRows')}"
    )
    for s in p.get("stateOperators", []):
        print(
            f"   state op={s.get('operatorName')} commitTime={s.get('allUpdatesTimeMs')}/"
            f"{s.get('commitTimeMs')}ms mem={s.get('memoryUsedBytes')} "
            f"rowsTotal={s.get('numRowsTotal')}"
        )
