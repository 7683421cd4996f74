"""stitchax.data — host-side input pipeline (L5 data infra).

Rebuild of the reference's dataset layer (reference: core/datasets.py,
core/utils/frame_utils.py, core/utils/augmentor.py). TPU-first: a
thread-pooled prefetching loader feeds pinned numpy batches to the device
(replacing torch DataLoader workers, SURVEY.md §2.10 host parallelism).
"""

from .udis import UDISDataset, PrefetchLoader, fetch_dataloader
from .frame_utils import (read_flo, write_flo, read_pfm, write_pfm, read_gen)
from .flow_viz import flow_to_image

__all__ = ["UDISDataset", "PrefetchLoader", "fetch_dataloader",
           "read_flo", "write_flo", "read_pfm", "write_pfm", "read_gen",
           "flow_to_image"]
