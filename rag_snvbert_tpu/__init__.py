"""rag_snvbert_tpu — TPU-native RAG-SNVBERT framework.

A from-scratch JAX/XLA/Pallas re-design of wangbaonan/RAG-SNVBERT: BERT-style SNV
genotype imputation over haplotype windows with retrieval augmentation from a
reference haplotype panel.  The retrieval layer (the reference's FAISS surface)
is an HBM-resident exact-L2 / Hamming flat index with fused Pallas
distance-matmul + streaming top-k kernels and cross-chip top-k merge over ICI.

Layer map (mirrors SURVEY.md section 1 of the reference analysis):
  io/        host-side genomics I/O: VCF/HDF5, panel, windows, freq, vocab  (L0)
  data/      pure-function masking, tokenization, window-major batching     (L1)
  index/     device-resident flat L2/Hamming index + sharded search         (L2)
  ops/       Pallas kernels and XLA reference implementations
  models/    embeddings, fusion, encoder, heads                             (L3/L4)
  parallel/  mesh + sharding helpers, distributed top-k merge
  train/     train step (pjit), losses, metrics, schedule, checkpointing    (L5)
  infer/     window-major imputation + VCF emission                         (L6)
  cli/       typed-config entry points                                      (L7)
"""

__version__ = "0.1.0"
