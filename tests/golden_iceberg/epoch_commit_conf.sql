SET spark.sql.iceberg.snapshot-property.engine.epoch-id = 42
