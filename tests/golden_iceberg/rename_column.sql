ALTER TABLE cat.db.transcripts RENAME COLUMN tool TO tool_name
