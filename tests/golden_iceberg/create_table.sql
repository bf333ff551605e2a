CREATE TABLE IF NOT EXISTS cat.db.transcripts (conv_id string, turn_idx int, role string, text string, tool string, ts timestamp, lsn bigint, metadata string, _tombstone boolean)
USING iceberg
PARTITIONED BY (bucket(16, conv_id))
TBLPROPERTIES ('format-version'='2', 'write.merge.mode'='merge-on-read', 'write.update.mode'='merge-on-read', 'write.delete.mode'='merge-on-read')
