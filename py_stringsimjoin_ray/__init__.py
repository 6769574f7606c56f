"""py_stringsimjoin_ray — a Ray-Data-native record-linkage / string
similarity join engine with the query surface of anhaidgroup/py_stringsimjoin,
re-designed (not ported) around ray.data.Dataset pipelines.

Reference checkout (read-only, semantics source): /root/reference
"""

__version__ = '0.1.0'

from .core.tokenizers import (AlphanumericTokenizer, DelimiterTokenizer,  # noqa: F401
                              QgramTokenizer, Tokenizer, WhitespaceTokenizer)
from .functions import get_install_path, remove_non_ascii  # noqa: F401
from .functions.converter import dataframe_column_to_str, series_to_str  # noqa: F401
from .functions.profiler import profile_counts, profile_table_for_join  # noqa: F401
from .pipelines.filters import (Filter, OverlapFilter, PositionFilter,  # noqa: F401
                                PrefixFilter, SizeFilter, SuffixFilter)
from .pipelines.join import (add_dense_id, cosine_join, dice_join,  # noqa: F401
                             edit_distance_join, jaccard_join,
                             overlap_coefficient_join, overlap_join)
from .pipelines.disk_join import disk_edit_distance_join  # noqa: F401
from .pipelines.matcher import apply_matcher  # noqa: F401
from .sources.datasets import load_books_dataset, load_person_dataset  # noqa: F401

# training-data-pipeline operators (Ray-native additions beyond the
# reference surface; see SURVEY.md §2 "LLM-data-pipeline operators")
from .core.index_shims import (InvertedIndex, PositionIndex,  # noqa: F401
                               PrefixIndex, SizeIndex)
from .stages.ann import (ann_topk_bruteforce, ann_topk_ivf,  # noqa: F401
                         ann_topk_lsh, cosine_neardup_pairs)
from .stages.cluster import connected_components  # noqa: F401
from .stages.dedup import (exact_dedup, minhash_lsh_pairs,  # noqa: F401
                           near_dedup, simhash_near_dup_pairs)
from .stages.windows import sessionize, tumbling_window_agg  # noqa: F401
