from medseg_tpu.data.manifest import Sample, load_manifest  # noqa: F401
from medseg_tpu.data.splits import generate_splits, stratified_split, write_split_csvs  # noqa: F401
from medseg_tpu.data.packed import PackedDataset, pack_split, save_packed, load_packed  # noqa: F401
from medseg_tpu.data.loader import BatchLoader, split_train_val  # noqa: F401
from medseg_tpu.data.synthetic import synthetic_cls, synthetic_seg  # noqa: F401
