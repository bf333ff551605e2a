CALL cat.system.fast_forward(table => 'db.transcripts', branch => 'main', to => 'audit')
