"""Verify-recipe: drive the streaming TableApp from OUTSIDE /root/repo.

Stages events as part files, streams them through a keyed running-balance
fold into a parquet sink with a checkpoint, stops mid-stream state, restages
more files, restarts on the same checkpoint, and asserts exactly-once output
(every staged event id exactly once). Worker-side pickling/import issues
only appear when the driver cwd is NOT the repo — which is the point.
"""
import os
import shutil
import sys
import tempfile

assert os.getcwd() != "/root/repo", "run me from outside the repo"
sys.path.insert(0, "/root/repo")  # driver-side import only; workers must
# get the package from ensure_package_on_workers' addPyFile zip

from pyspark.sql import functions as F  # noqa: E402

from fluvii_spark.io.readers import load_table  # noqa: E402
from fluvii_spark.session import get_session  # noqa: E402
from fluvii_spark.streaming.app import TableApp  # noqa: E402

root = tempfile.mkdtemp(prefix="stream_drive_")
src_dir = os.path.join(root, "src")
out_dir = os.path.join(root, "out")
ck_dir = os.path.join(root, "ck")
os.makedirs(src_dir)

spark = get_session("stream-drive", master="local[4]", shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")

# load_table handles the TIMESTAMP(NANOS) storage (ts DIV 1000 -> micros);
# a raw read + cast would misread nanos as seconds
ev = (
    load_table(spark, "/root/testdata/sf0.001", "events")
    .select("event_id", "user_id", "value", F.expr("cast(ts as timestamp) ts"))
    .limit(2000)
    .cache()
)
first = ev.filter(F.col("event_id") % 2 == 0)
second = ev.filter(F.col("event_id") % 2 == 1)
first.coalesce(2).write.mode("overwrite").parquet(os.path.join(src_dir, "b0"))

schema = spark.read.parquet(os.path.join(src_dir, "b0")).schema
def make_src():
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src_dir, "*"))
    )

def app(txn):
    bal = txn.read_table_entry() or 0.0
    bal += txn.value()["value"] or 0.0
    txn.update_table_entry(bal)
    txn.produce({"event_id": txn.value()["event_id"], "balance": bal})

def run_once():
    a = TableApp(
        make_src(), app, ["user_id"],
        "event_id long, balance double", order_by=["ts", "event_id"],
    )
    q = a.start(sink_format="parquet", checkpoint_dir=ck_dir, path=out_dir)
    q.processAllAvailable()
    q.stop()

run_once()                                     # phase 1: even ids
second.coalesce(2).write.mode("overwrite").parquet(os.path.join(src_dir, "b1"))
run_once()                                     # phase 2: restart, odd ids

got = sorted(
    r["event_id"] for r in spark.read.parquet(out_dir).collect()
)
want = sorted(r["event_id"] for r in ev.collect())
assert got == want, (
    f"exactly-once violated: {len(got)} out vs {len(want)} in; "
    f"dups={len(got) - len(set(got))}"
)
print(f"STREAM_DRIVE_OK rows={len(got)} exactly-once across restart")
spark.stop()
shutil.rmtree(root, ignore_errors=True)
