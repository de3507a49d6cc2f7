from . import masking
from .pipeline import WindowDataset, WindowMeta
from .tokenize import (genotype_label, position_normalize, sequence_padding,
                       tokenize)
