from .corpus import (  # noqa: F401
    curate,
    curation_flags,
    funnel,
    funnel_df,
    pipeline_curate,
)
