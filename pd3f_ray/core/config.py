"""Extraction options.

Mirrors the keyword surface of the reference's ``Export.__init__``
(/root/reference/pd3f/export.py:159-212) and ``extract()``
(export.py:30-103, where ``experimental`` fans out to
``seperate_header_footer`` / ``footnotes_last`` / ``remove_page_number``).
"""

from __future__ import annotations

from dataclasses import dataclass, replace


@dataclass(frozen=True)
class ExtractOptions:
    remove_punct_paragraph: bool = True
    separate_header_footer: bool = True
    remove_duplicate_header_footer: bool = True
    remove_page_number: bool = True
    remove_header: bool = False
    remove_footer: bool = False
    remove_hyphens: bool = True
    footnotes_last: bool = True
    lang: str = "multi"
    fast: bool = False
    # rule 0 of the line-join cascade: force a linebreak when the modal
    # fonts of adjacent lines differ materially. The reference hard-codes
    # this off ("kind of buggy ... for OCRd PDFs", export.py:199-201) and
    # consults it at export.py:332-339; exposed here as a real option,
    # default off to match.
    consider_font_size_linebreak: bool = False

    def __post_init__(self) -> None:
        # reference raises the same way (export.py:194-197)
        if self.separate_header_footer and (self.remove_header or self.remove_footer):
            raise ValueError(
                "separate_header_footer=True cannot be combined with "
                "remove_header/remove_footer"
            )
        # the reference crashes with a TypeError here (export.py:312-314 iterates
        # None); we make the invalid combination an explicit error.
        if self.remove_page_number and not self.separate_header_footer:
            raise ValueError(
                "remove_page_number=True requires separate_header_footer=True "
                "(the reference implementation crashes on this combination)"
            )

    @classmethod
    def experimental(cls, lang: str = "multi", fast: bool = False) -> "ExtractOptions":
        """The configuration the reference test-suite runs
        (tests/test_pdfs.py:14-17: experimental=True, fast=True)."""
        return cls(
            separate_header_footer=True,
            footnotes_last=True,
            remove_page_number=True,
            lang=lang,
            fast=fast,
        )

    @classmethod
    def plain(cls, lang: str = "multi") -> "ExtractOptions":
        """Non-experimental path: headers/footers stay inline in the body."""
        return cls(
            separate_header_footer=False,
            footnotes_last=False,
            remove_page_number=False,
            lang=lang,
        )

    def with_(self, **kw) -> "ExtractOptions":
        return replace(self, **kw)


# Reference ``extract()``/``Export`` kwargs with no equivalent in this
# engine (Parsr service / OCR / GPU are outside the engine boundary —
# export.py:30-103, parsr_wrapper.py:17-50). The reference-shaped API
# accepts them with a warning instead of crashing the call site; they
# never reach ExtractOptions.
IGNORED_REFERENCE_KWARGS = frozenset(
    {"ocr", "ocrd", "force_gpu", "parsr_location", "parsr_config",
     "parsr_adjust_cleaner_config", "check_tables"}
)

# the reference spells this kwarg with a typo; accept both
_KWARG_ALIASES = {"seperate_header_footer": "separate_header_footer"}


def normalize_reference_kwargs(kwargs: dict) -> dict:
    """Split reference-surface kwargs into ExtractOptions kwargs,
    warning on (and dropping) service-level ones this engine does not
    have. Unknown names still raise via ``ExtractOptions.with_``."""
    import warnings

    out = {}
    for k, v in kwargs.items():
        k = _KWARG_ALIASES.get(k, k)
        if k in IGNORED_REFERENCE_KWARGS:
            warnings.warn(
                f"pd3f_ray: reference kwarg {k!r} is accepted but ignored "
                "(no Parsr/OCR/GPU service in this engine)",
                stacklevel=3,
            )
            continue
        out[k] = v
    return out
