spark.sql.autoBroadcastJoinThreshold=-1
spark.sql.requireAllClusterKeysForCoPartition=false
spark.sql.sources.v2.bucketing.enabled=true
spark.sql.sources.v2.bucketing.pushPartValues.enabled=true
