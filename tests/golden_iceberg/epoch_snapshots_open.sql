SELECT snapshot_id, CAST(summary['engine.epoch-id'] AS BIGINT) AS epoch_id FROM cat.db.transcripts.snapshots WHERE CAST(summary['engine.epoch-id'] AS BIGINT) >= 10 ORDER BY epoch_id
