import sys, json, re
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions","8")
         .config("spark.sql.session.timeZone","UTC")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
sys.path.insert(0, "/root/repo/scripts")
from plan_metrics import metrics
qs = e.queries()
out = {}
for i, (name, fn) in enumerate(qs.items()):
    try:
        df = fn(spark, "/root/testdata/sf0.001")
        qe = df._jdf.queryExecution()
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        m = metrics(qe.explainString(mode))
        out[name] = m
    except Exception as exc:
        out[name] = {"error": str(exc)[:120]}
    spark.catalog.clearCache()
    print(f"[{i+1}/{len(qs)}] {name}", flush=True)
with open("/tmp/plan_sweep.json","w") as f:
    json.dump(out, f, indent=1)
flag = {n: m for n, m in out.items() if m.get("cartesian") or m.get("sort_agg") or m.get("error")}
print("FLAGGED:", json.dumps(flag, indent=1))
