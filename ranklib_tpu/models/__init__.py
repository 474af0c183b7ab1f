from ranklib_tpu.models.base import (  # noqa: F401
    Ranker,
    RANKER_NAMES,
    get_ranker_class,
    load_ranker_file,
)
