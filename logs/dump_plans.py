"""Dump .explain('formatted') for named queries to plans/r14/<name>_<tag>.txt."""
import os, sys
repo = sys.argv[1]; tag = sys.argv[2]; names = sys.argv[3].split(",")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
sys.path.insert(0, repo)
from bakery_big_data_spark.plans import REGISTRY
from bakery_big_data_spark.session import get_spark
spark = get_spark("plan-dump")
spark.sparkContext.setLogLevel("ERROR")
out_dir = "/root/repo/plans/r14"
for n in names:
    df = REGISTRY[n].build(spark, sf_dir)
    txt = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    with open(os.path.join(out_dir, f"{n}_{tag}.txt"), "w") as fh:
        fh.write(txt)
    print(n, tag, "->", len(txt), "chars")
spark.stop()
