from .freq import AF, HET, HOM, REF, FreqTable, build_freq_matrix
from .panel import PanelData
from .vcf import (VCFData, load_hdf5, load_vcf_or_hdf5, read_vcf,
                  vcf_to_hdf5, write_imputed_vcf, write_simple_vcf)
from .vocab import (ALLELE_OFFSET, EOS, INFER_WINDOW_LEN, MASK, MAX_SEQ_LEN,
                    PAD, POP_OFFSET, SOS, UNK, Vocab)
from .windows import Window
