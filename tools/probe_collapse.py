import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from postgraph_spark.session import get_spark
from postgraph_spark.queries import QUERIES

SF = "/root/testdata/sf0.01"
spark = get_spark()


def measure(tag):
    df = QUERIES["cypher_temporal_funcs"](spark, SF)
    qe = df._jdf.queryExecution()
    ana = qe.analyzed().toString()
    opt = qe.optimizedPlan().toString()
    print(tag,
          "analyzed_max", max(len(l) for l in ana.splitlines()),
          "optimized_max", max(len(l) for l in opt.splitlines()))


measure("default")
for rules in [
    "org.apache.spark.sql.catalyst.optimizer.CollapseProject",
    "org.apache.spark.sql.catalyst.optimizer.SimplifyExtractValueOps",
    "org.apache.spark.sql.catalyst.optimizer.CollapseProject,org.apache.spark.sql.catalyst.optimizer.SimplifyExtractValueOps",
]:
    spark.conf.set("spark.sql.optimizer.excludedRules", rules)
    measure(rules.split(".")[-1])
    spark.conf.unset("spark.sql.optimizer.excludedRules")
