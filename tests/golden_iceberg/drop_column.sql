ALTER TABLE cat.db.transcripts DROP COLUMN tool
