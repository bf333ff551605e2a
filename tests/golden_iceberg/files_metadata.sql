SELECT file_path, partition, record_count AS records, file_size_in_bytes AS bytes FROM cat.db.transcripts.files
