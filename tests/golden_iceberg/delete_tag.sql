ALTER TABLE cat.db.transcripts DROP TAG `rc-1`
