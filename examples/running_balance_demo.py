"""Demo: the reference's running-balance consumer, fluvii-spark style.

Mirrors ``examples/fluvii_demo_current_2023`` in the reference repo — a
producer feeding account transactions and a stateful consumer maintaining a
running balance per account and rejecting overdrafts
(``fluvii_consumer_ex.py:21-42`` semantics) — with files standing in for
topics so it runs anywhere (swap the file source/sink for
``fluvii_spark.io.kafka`` builders on a real cluster).

Run:  python examples/running_balance_demo.py
"""

from __future__ import annotations

import os
import random
import shutil
import sys
import tempfile

# allow running straight from a checkout (pip install -e . also works)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fluvii_spark import get_session
from fluvii_spark.streaming import TableApp

OUT_SCHEMA = "account STRING, tx_id BIGINT, amount DOUBLE, balance DOUBLE, status STRING"
START_BALANCE = 1000.0


def balance_app(txn) -> None:
    """The user 'app_function': reject transactions that would overdraft."""
    msg = txn.value()
    st = txn.read_table_entry() or {"balance": START_BALANCE}
    new_balance = st["balance"] + msg["amount"]
    if new_balance < 0:
        txn.produce(
            {
                "account": msg["account"],
                "tx_id": msg["tx_id"],
                "amount": msg["amount"],
                "balance": st["balance"],
                "status": "rejected",
            }
        )
        return
    txn.update_table_entry({"balance": new_balance})
    txn.produce(
        {
            "account": msg["account"],
            "tx_id": msg["tx_id"],
            "amount": msg["amount"],
            "balance": new_balance,
            "status": "ok",
        }
    )


def main() -> None:
    spark = get_session("running-balance-demo", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="fluvii_demo_")
    in_topic = os.path.join(work, "transactions")
    out_topic = os.path.join(work, "balances")

    # --- "producer": write 500 transactions as the input topic ------------
    rng = random.Random(42)
    rows = [
        (f"acct{rng.randrange(8)}", i, round(rng.uniform(-300, 250), 2))
        for i in range(500)
    ]
    spark.createDataFrame(rows, "account STRING, tx_id LONG, amount DOUBLE") \
        .repartition(4).write.parquet(in_topic)

    # --- "consumer": stateful stream over the topic -----------------------
    schema = spark.read.parquet(in_topic).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_topic)
    )
    app = TableApp(
        stream,
        balance_app,
        key_cols=["account"],
        output_schema=OUT_SCHEMA,
        order_by=["tx_id"],
    )
    q = app.start(
        sink_format="parquet",
        checkpoint_dir=os.path.join(work, "ckpt"),
        path=out_topic,
    )
    q.processAllAvailable()
    app.stop()

    # --- inspect ----------------------------------------------------------
    out = spark.read.parquet(out_topic)
    print(f"processed {out.count()} transactions")
    out.groupBy("account", "status").count().orderBy("account", "status").show()
    finals = (
        out.filter("status = 'ok'")
        .groupBy("account")
        .agg(F.max_by("balance", "tx_id").alias("final_balance"))
        .orderBy("account")
    )
    print("final balances:")
    for r in finals.collect():
        print(f"  {r['account']}: {r['final_balance']:.2f}")
    shutil.rmtree(work)
    spark.stop()


if __name__ == "__main__":
    main()
