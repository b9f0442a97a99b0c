from __future__ import annotations

import shutil

import pytest

from mms_rdf_spark.session import get_spark
from mms_rdf_spark.synth import make_transcripts


@pytest.fixture(scope="session")
def spark():
    s = get_spark("mms-rdf-tests", cores=8, shuffle_partitions=16)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_pdf():
    """Correctness corpus: ~5k turns incl. two 600-turn conversations."""
    return make_transcripts(n_convs=120, seed=42, hot_conv_turns=600)


@pytest.fixture(scope="session")
def transcripts_df(spark, transcripts_pdf):
    return spark.createDataFrame(transcripts_pdf)


@pytest.fixture(scope="session")
def golden(transcripts_pdf):
    from mms_rdf_spark.oracle import convert_transcripts

    return convert_transcripts(transcripts_pdf)


@pytest.fixture(scope="session")
def triples_df(spark, transcripts_df):
    from mms_rdf_spark.operators.extract import extract_triples

    return extract_triples(spark, transcripts_df).cache()


@pytest.fixture()
def tmp_out(tmp_path):
    d = str(tmp_path / "out")
    yield d
    shutil.rmtree(d, ignore_errors=True)
