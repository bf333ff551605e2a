from .changelog_gen import generate_changelog  # noqa: F401
from .debezium import debezium_envelope_schema, parse_debezium  # noqa: F401
from .extract import extract_raw_csv, sample_schema  # noqa: F401
