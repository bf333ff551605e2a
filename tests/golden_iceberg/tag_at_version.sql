ALTER TABLE cat.db.transcripts CREATE TAG `rc-1` AS OF VERSION 7
