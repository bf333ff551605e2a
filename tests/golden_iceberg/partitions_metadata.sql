SELECT partition, file_count AS files, total_data_file_size_in_bytes AS bytes, record_count AS records FROM cat.db.transcripts.partitions
