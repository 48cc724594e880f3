from snuffy_tpu.data.bags import BagData, load_bag_csv, load_split  # noqa: F401
from snuffy_tpu.data.bucketing import pad_bag, bucket_length  # noqa: F401
from snuffy_tpu.data.mil_pickle import (  # noqa: F401
    load_mil_data,
    cross_validation_set,
    parse_svm_file,
    build_mil_pickle,
)
