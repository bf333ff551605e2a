CALL cat.system.expire_snapshots(table => 'db.transcripts', older_than => TIMESTAMP '<NOW - older_than_secs>', retain_last => 3)
