CALL cat.system.create_changelog_view(table => 'db.transcripts', changelog_view => 'engine_changes')
