"""Text featurization (north-star: the reference drops its only text column
— games.Description, `bgrfunctions.py:84`; a training-data engine turns text
into features instead).

All MLlib, all sparse-friendly:
- ``tfidf_pipeline``  — Tokenizer → StopWordsRemover → HashingTF → IDF.
  HashingTF needs no vocabulary fit (stateless hash — the 100 TB choice);
  CountVectorizer variant kept for when an explicit vocab matters.
- ``word2vec_pipeline`` — dense document embeddings for the similarity
  operators (operators.similarity consumes the output directly).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.sql import DataFrame


def tfidf_pipeline(
    text_col: str = "text",
    out_col: str = "tfidf",
    num_features: int = 1 << 18,
    use_count_vectorizer: bool = False,
    vocab_size: int = 1 << 16,
    min_df: float = 1.0,
) -> Pipeline:
    from pyspark.ml.feature import (
        CountVectorizer,
        HashingTF,
        IDF,
        RegexTokenizer,
        StopWordsRemover,
    )

    tok = RegexTokenizer(inputCol=text_col, outputCol="_tokens", pattern=r"\s+")
    stop = StopWordsRemover(inputCol="_tokens", outputCol="_filtered")
    if use_count_vectorizer:
        tf = CountVectorizer(
            inputCol="_filtered", outputCol="_tf", vocabSize=vocab_size, minDF=min_df
        )
    else:
        tf = HashingTF(inputCol="_filtered", outputCol="_tf", numFeatures=num_features)
    idf = IDF(inputCol="_tf", outputCol=out_col)
    return Pipeline(stages=[tok, stop, tf, idf])


def word2vec_pipeline(
    text_col: str = "text",
    out_col: str = "doc_vec",
    vector_size: int = 32,
    min_count: int = 1,
    seed: int = 1,
) -> Pipeline:
    from pyspark.ml.feature import RegexTokenizer, Word2Vec

    tok = RegexTokenizer(inputCol=text_col, outputCol="_tokens", pattern=r"\s+")
    w2v = Word2Vec(
        inputCol="_tokens", outputCol=out_col,
        vectorSize=vector_size, minCount=min_count, seed=seed,
    )
    return Pipeline(stages=[tok, w2v])


def embed_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vector_size: int = 32,
    seed: int = 1,
) -> tuple[DataFrame, PipelineModel]:
    """Word2Vec document embeddings as array<double> — plugs straight into
    operators.similarity (cosine_topk / embedding_near_dup)."""
    from pyspark.ml.functions import vector_to_array

    model = word2vec_pipeline(text_col, "_vec", vector_size, seed=seed).fit(docs)
    out = model.transform(docs).select(
        id_col, vector_to_array("_vec").alias("embedding")
    )
    return out, model
