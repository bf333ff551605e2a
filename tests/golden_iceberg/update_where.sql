UPDATE cat.db.transcripts SET text = upper(text), tool = NULL WHERE (turn_idx = 5) AND NOT coalesce(_tombstone, false)
