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
# warm run
df = fn(spark, sf_dir)
t0 = time.monotonic()
df.write.format("noop").mode("overwrite").save()
print("warm:", round(time.monotonic() - t0, 2))
# measured run
spark.sparkContext.setJobDescription(f"{name} steady")
df = fn(spark, sf_dir)
t0 = time.monotonic()
df.write.format("noop").mode("overwrite").save()
print("steady:", round(time.monotonic() - t0, 2))

app = json.load(urllib.request.urlopen("http://localhost:4099/api/v1/applications"))[0]["id"]
stages = json.load(urllib.request.urlopen(f"http://localhost:4099/api/v1/applications/{app}/stages?status=complete"))
stages.sort(key=lambda s: -s.get("executorRunTime", 0))
print(f"{'stage':>6} {'tasks':>6} {'runTimeSec':>10} {'wallSec':>8}  name")
for s in stages[:14]:
    import datetime
    sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
    comp = s.get("completionTime")
    wall = ""
    try:
        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
        wall = round((datetime.datetime.strptime(comp[:23]+"GMT", fmt) - datetime.datetime.strptime(sub[:23]+"GMT", fmt)).total_seconds(), 1)
    except Exception:
        pass
    print(f"{s['stageId']:>6} {s['numCompleteTasks']:>6} {s['executorRunTime']/1000:>10.1f} {wall:>8}  {s['name'][:70]}")
spark.stop()
