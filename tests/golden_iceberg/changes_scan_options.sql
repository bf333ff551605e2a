end-snapshot-id=5678
start-snapshot-id=1234
