from .embeddings import AFEmbedding, BERTEmbedding
from .transformer import Encoder, FeedForward, MultiHeadAttention, TransformerBlock
from .fusion import (ConcatFusion, CrossAFInteraction, CrossAttentionFusion,
                     EmbeddingFusionModule, EnhancedRareVariantFusion,
                     FixedConcatFusion, PositionFeatModule,
                     RareVariantAwareFusion)
from .bert import BERT, BERTWithEmbeddingRAG, BERTWithRAG
from .heads import (BERTFoundationModel, EnhancedHaplotypeClassifier,
                    GenotypeClassifier, init_batch)
