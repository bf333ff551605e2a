SELECT count(*) AS n FROM cat.db.transcripts.snapshots WHERE summary['engine.epoch-id'] = '42'
