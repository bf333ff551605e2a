from .changelog_gen import generate_changelog  # noqa: F401
