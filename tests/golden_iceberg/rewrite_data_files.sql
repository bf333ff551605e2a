CALL cat.system.rewrite_data_files(table => 'db.transcripts', strategy => 'sort')
