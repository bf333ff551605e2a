ALTER TABLE cat.db.transcripts CREATE BRANCH `audit`
