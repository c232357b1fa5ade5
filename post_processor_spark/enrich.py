"""Enrichment stages (SURVEY.md §2.2 P18-P20): injectable mapInPandas
transforms replacing the reference's subprocess-per-row patterns.

- expand_urls: short-URL expansion (scripts/url_expander/expand.py:50-73):
  skip predicate ('www' in url or twitter status url) evaluated JVM-side;
  only the to-expand subset flows through the Arrow resolver stage. The
  resolver is injected (network is out of scope in the sandbox; identity
  by default) — same shape as the reference's urlexpander/puppeteer
  fallback chain.
- fill_missing_dates: (archived/utils/insert_missing_dates.py:30-44)
  when(date empty, finder(url)) — finder injected, deterministic stub by
  default (htmldate is a network scraper).
- scrape_metadata: (scripts/metascraper/getDates.py:22-86) batch-resume
  semantics: rows already enriched are skipped via an anti-join on the
  done-set, mirroring the resume-if-already-processed check (:25-34).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _identity_resolver(urls: pd.Series) -> pd.Series:
    return urls


def expand_urls(
    df: DataFrame,
    url_col: str = "url",
    resolver: Callable[[pd.Series], pd.Series] | None = None,
) -> DataFrame:
    """Adds expanded_url. Skip predicate per the reference: urls containing
    'www' or starting with the twitter status prefix are passed through
    (expand.py:52-55)."""
    resolver = resolver or _identity_resolver
    skip = F.col(url_col).contains("www") | F.col(url_col).contains(
        "https://twitter.com/"
    )

    @F.pandas_udf("string")
    def resolve(urls: pd.Series) -> pd.Series:
        return resolver(urls).astype(str)

    return df.withColumn(
        "expanded_url",
        F.when(skip, F.col(url_col)).otherwise(resolve(F.col(url_col))),
    )


def fill_missing_dates(
    df: DataFrame,
    date_col: str = "date",
    url_col: str = "url",
    finder: Callable[[pd.Series], pd.Series] | None = None,
) -> DataFrame:
    """P20: only rows with empty/null date go through the finder stage."""
    if finder is None:
        def finder(urls: pd.Series) -> pd.Series:  # deterministic stub
            return pd.Series(["1970-01-01"] * len(urls), index=urls.index)

    @F.pandas_udf("string")
    def find_date(urls: pd.Series) -> pd.Series:
        return finder(urls).astype(str)

    empty = F.col(date_col).isNull() | (F.col(date_col) == "")
    return df.withColumn(
        date_col, F.when(empty, find_date(F.col(url_col))).otherwise(F.col(date_col))
    )


def scrape_metadata(
    df: DataFrame,
    done: DataFrame | None,
    url_col: str = "url",
    scraper: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
) -> DataFrame:
    """P19 with resume: rows whose url is in `done` are skipped (anti-join)
    before the scraper stage; caller unions results back with done."""
    todo = df if done is None else df.join(done.select(url_col), url_col, "left_anti")
    if scraper is None:
        def scraper(pdf: pd.DataFrame) -> pd.DataFrame:  # deterministic stub
            pdf = pdf.copy()
            pdf["scraped_title"] = "title:" + pdf[url_col].astype(str)
            pdf["scraped_date"] = "1970-01-01"
            return pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in todo.schema.fields)
    schema += ", scraped_title string, scraped_date string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield scraper(pdf)

    return todo.mapInPandas(gen, schema=schema)
