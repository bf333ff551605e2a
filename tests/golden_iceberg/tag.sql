ALTER TABLE cat.db.transcripts CREATE TAG `rc-1`
