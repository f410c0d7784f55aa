from .label_modes import (
    CURRICULUM_MODES,
    EXPECTED_COUNTS,
    LABEL_MODES,
    labels_for,
    nway_for,
)
from .loaders import (
    iter_jsonl,
    load_passages,
    load_queries,
    load_train_examples,
    passage_text,
)
from .bucketing import (
    BucketSpec,
    bucket_specs,
    bucketize,
    default_bucket_lengths,
)
from .docstore import TsvDocStore
from .nway_dataset import NwayBatch, NwayDataset
from .packing import PackedBatch, pack_nway_batch
from .teacher import (
    CURRICULUM_BUCKETS,
    bucket_example,
    build_curriculum_files,
    rerank_candidates_with_teacher,
)
from .reranking_dataset import (
    MsMacroRerankingDataset,
    MsMarcoRerankingDataset,
    RerankBatch,
    RerankingDataset,
)
from .sequence_dataset import SequenceBatch, SequenceDataset
from .token_cache import TokenCacheDataset, token_cache_exists, write_token_cache
from .tokenization import (
    HFTokenizerAdapter,
    HashTokenizer,
    train_wordpiece_tokenizer,
)

__all__ = [
    "CURRICULUM_MODES",
    "EXPECTED_COUNTS",
    "LABEL_MODES",
    "labels_for",
    "nway_for",
    "iter_jsonl",
    "load_passages",
    "TsvDocStore",
    "load_queries",
    "load_train_examples",
    "passage_text",
    "BucketSpec",
    "bucket_specs",
    "bucketize",
    "default_bucket_lengths",
    "NwayBatch",
    "NwayDataset",
    "CURRICULUM_BUCKETS",
    "bucket_example",
    "build_curriculum_files",
    "rerank_candidates_with_teacher",
    "RerankBatch",
    "RerankingDataset",
    "MsMarcoRerankingDataset",
    "MsMacroRerankingDataset",
    "SequenceBatch",
    "SequenceDataset",
    "TokenCacheDataset",
    "token_cache_exists",
    "write_token_cache",
    "HFTokenizerAdapter",
    "HashTokenizer",
    "train_wordpiece_tokenizer",
]
