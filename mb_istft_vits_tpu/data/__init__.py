"""Host-side data pipeline: filelist datasets, spectrogram cache,
length-bucketed static-shape batching."""

from mb_istft_vits_tpu.data.dataset import (  # noqa: F401
    BucketedBatcher,
    TextAudioDataset,
    load_filepaths_and_text,
)
from mb_istft_vits_tpu.data.prefetch import (  # noqa: F401
    PrefetchIterator,
    device_prefetch,
    prefetch_epoch,
)
from mb_istft_vits_tpu.data.resident import (  # noqa: F401
    DeviceResidentFeeder,
)
