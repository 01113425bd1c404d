"""Per-operator diagnosis: runs a query twice (warm+steady) with the UI
enabled and dumps the steady run's SQL plan node metrics (rows, time).
Usage: python scripts_diag_sql.py QUERY [SF_DIR]"""
import json, os, sys, time, urllib.request

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from doc_ocr_spark.session import get_spark
import __spark_entry__ as entrymod

name = sys.argv[1]
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf1.0"

spark = get_spark(
    "diag", master="local[32]", shuffle_partitions=32,
    extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4099"},
)
fn = {**entrymod.queries(), **entrymod.retired_queries()}[name]
df = fn(spark, sf_dir)
t0 = time.monotonic()
df.write.format("noop").mode("overwrite").save()
print("warm:", round(time.monotonic() - t0, 2), flush=True)
spark.sparkContext.setJobDescription(f"{name} steady")
df = fn(spark, sf_dir)
t0 = time.monotonic()
df.write.format("noop").mode("overwrite").save()
print("steady:", round(time.monotonic() - t0, 2), flush=True)

base = "http://localhost:4099/api/v1"
app = json.load(urllib.request.urlopen(f"{base}/applications"))[0]["id"]
sqls = json.load(urllib.request.urlopen(f"{base}/applications/{app}/sql?length=200&details=true&planDescription=false"))
# last completed query with a description containing 'steady'
target = None
for q in sqls:
    if q.get("description", "").startswith(f"{name} steady"):
        target = q
target = target or sqls[-1]
detail = json.load(urllib.request.urlopen(f"{base}/applications/{app}/sql/{target['id']}?details=true&planDescription=true"))
for node in detail.get("nodes", []):
    mets = {m["name"]: m["value"] for m in node.get("metrics", [])}
    keep = {}
    for k, v in mets.items():
        if any(s in k for s in ("number of output rows", "time total", "time in", "spill", "data size", "shuffle bytes written", "records read", "build time", "collect time")):
            keep[k] = v
    if keep:
        print(node["nodeId"], node["nodeName"], json.dumps(keep)[:400], flush=True)
spark.stop()
