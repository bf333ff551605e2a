SELECT * FROM cat.db.transcripts TIMESTAMP AS OF '2024-06-01 00:00:00' WHERE NOT coalesce(_tombstone, false)
