import sys, time, tempfile
sys.path.insert(0, "/root/repo")
mode = sys.argv[1]
from lambda_kafka_to_s3_parquet_spark import get_spark
from lambda_kafka_to_s3_parquet_spark.operators.snapshots import snapshot_append

extra = {}
if mode in ("committer", "both"):
    extra = {
        "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
        "spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs": "false",
    }
spark = get_spark(app_name="prof-append3", shuffle_partitions=8, extra_conf=extra)
if mode in ("checksum", "both"):
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    lfs = jvm.org.apache.hadoop.fs.FileSystem.getLocal(hconf)
    lfs.setWriteChecksum(False)
    lfs.setVerifyChecksum(False)
base = tempfile.mkdtemp(prefix="prof3_")
table = f"{base}/t"
snapshot_append(spark, f"{base}/warm", spark.createDataFrame([(0, 0)], "k long, v long"))
t0 = time.perf_counter()
for i in range(50):
    snapshot_append(spark, table, spark.createDataFrame([(i, i*10)], "k long, v long"))
print(mode, "50 appends:", round(time.perf_counter()-t0, 2), "s")
spark.stop()
