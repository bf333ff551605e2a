ALTER TABLE cat.db.transcripts WRITE ORDERED BY ts
