from ranklib_tpu.data.dataset import Dataset, Query, QueryBucket, bucketize  # noqa: F401
from ranklib_tpu.data.letor import read_letor, write_letor  # noqa: F401
from ranklib_tpu.data.normalize import get_normalizer, NORMALIZERS  # noqa: F401
from ranklib_tpu.data.cv import prepare_cv  # noqa: F401
