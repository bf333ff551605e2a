DELETE FROM cat.db.transcripts WHERE _tombstone AND lsn IS NOT NULL AND lsn < 99000
