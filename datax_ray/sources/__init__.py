from datax_ray.sources.generators import (  # noqa: F401
    ChangelogSpec,
    TranscriptSpec,
    changelog_dataset,
    generate_changelog_block,
    generate_transcripts_block,
    transcripts_dataset,
)
