from ranklib_tpu.utils.errors import RankLibError  # noqa: F401
