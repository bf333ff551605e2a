MERGE INTO cat.db.transcripts t
USING changes_v s
ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
WHEN MATCHED AND (s.ts > t.ts OR t.ts = s.ts AND s.lsn > t.lsn) THEN UPDATE SET t.role = s.role, t.text = s.text, t.tool = s.tool, t.ts = s.ts, t.lsn = s.lsn, t.metadata = s.metadata, t._tombstone = (s.op = 'delete')
WHEN NOT MATCHED THEN INSERT (conv_id, turn_idx, role, text, tool, ts, lsn, metadata, _tombstone) VALUES (s.conv_id, s.turn_idx, s.role, s.text, s.tool, s.ts, s.lsn, s.metadata, (s.op = 'delete'))
