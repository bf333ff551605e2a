CALL cat.system.rewrite_data_files(table => 'db.transcripts', strategy => 'sort', where => 'ts < TIMESTAMP ''2024-06-01 00:00:00''')
