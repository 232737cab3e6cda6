"""Backend protocol surface (SURVEY.md §2.11): built-in actors satisfy
the structural contracts; validate_stage rejects malformed plugins."""

import pyarrow as pa
import pytest

from docling_graph_ray.stages.multimodal import MediaFeatureActor, MediaResizeActor
from docling_graph_ray.stages.pdf_parse import PdfParseActor
from docling_graph_ray.state.protocols import (
    BatchStage,
    DocumentParser,
    validate_stage,
)


def test_builtin_actors_are_batch_stages():
    assert isinstance(PdfParseActor(), BatchStage)
    assert isinstance(MediaFeatureActor(), BatchStage)
    assert isinstance(MediaResizeActor(), BatchStage)


def test_pdf_actor_is_document_parser():
    assert isinstance(PdfParseActor(), DocumentParser)


def test_validate_stage_accepts_conforming_plugin():
    class MyStage:
        def __init__(self):
            self.n = 0

        def __call__(self, batch: pa.Table) -> pa.Table:
            return batch

    validate_stage(MyStage, batch=pa.table({"x": [1]}))


def test_validate_stage_rejects_required_args():
    class NeedsArgs:
        def __init__(self, model_path):
            pass

        def __call__(self, batch):
            return batch

    with pytest.raises(TypeError, match="no arguments"):
        validate_stage(NeedsArgs)


def test_validate_stage_rejects_non_callable():
    class NoCall:
        pass

    with pytest.raises(TypeError, match="__call__"):
        validate_stage(NoCall)


def test_validate_stage_rejects_wrong_return():
    class WrongReturn:
        def __call__(self, batch):
            return {"rows": []}

    with pytest.raises(TypeError, match="pyarrow.Table"):
        validate_stage(WrongReturn, batch=pa.table({"x": [1]}))
