from .converter import MarkdownConverter, inject_source_url, postprocess_markdown

__all__ = ["MarkdownConverter", "inject_source_url", "postprocess_markdown"]
