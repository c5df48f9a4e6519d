from logparserhelper_spark.functions.textstats import (  # noqa: F401
    lang_id,
    quality_score,
    token_count,
)
from logparserhelper_spark.functions.dedup import (  # noqa: F401
    exact_dedup_groups,
    minhash_signatures,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
)
from logparserhelper_spark.functions.similarity import (  # noqa: F401
    brute_force_topk,
    cosine_similarity_col,
    lsh_bucketed_topk,
)
