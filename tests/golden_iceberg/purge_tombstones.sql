DELETE FROM cat.db.transcripts WHERE _tombstone
