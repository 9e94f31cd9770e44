import os, sys
sys.path.insert(0, '/root/repo')
names = sys.argv[1].split(",")
dirs = sys.argv[2].split(",")
from bakery_big_data_spark.plans import REGISTRY
from bakery_big_data_spark.session import get_spark
from tests.oracle import compare, duck_connect
spark = get_spark("verify-some")
spark.sparkContext.setLogLevel("ERROR")
fail = 0
for d in dirs:
    con = duck_connect(d)
    for n in names:
        q = REGISTRY[n]
        try:
            compare(q.build(spark, d), con, q.oracle)
            print(d, n, "MATCH")
        except Exception as e:
            fail += 1
            print(d, n, "FAIL:", str(e)[:200])
print("TOTAL FAIL:", fail)
spark.stop()
sys.exit(1 if fail else 0)
