"""Host-side data layer: HDF5 spectra I/O, datasets, device prefetch."""

from vit_tpu.data.hdf5 import load_spectra, read_params_table  # noqa: F401
from vit_tpu.data.synthetic import make_dummy_spectra, write_dummy_h5  # noqa: F401
from vit_tpu.data.datasets import (  # noqa: F401
    BaseSpecDataset,
    ClassSpecDataset,
    RegSpecDataset,
    SpecDataModule,
    dataset_from_config,
)
from vit_tpu.data.pipeline import Batcher, prefetch_to_device  # noqa: F401
