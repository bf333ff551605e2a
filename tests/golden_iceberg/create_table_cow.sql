CREATE TABLE IF NOT EXISTS cat.db.transcripts (conv_id string, turn_idx int, role string, text string, tool string, ts timestamp, lsn bigint, metadata string, _tombstone boolean)
USING iceberg
PARTITIONED BY (bucket(16, conv_id))
TBLPROPERTIES ('format-version'='2', 'write.merge.mode'='copy-on-write', 'write.update.mode'='copy-on-write', 'write.delete.mode'='copy-on-write')
