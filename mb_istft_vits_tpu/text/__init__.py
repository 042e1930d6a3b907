"""Text frontends (host-side): English/IPA and Japanese.

Behavior contract: reference `text/` and `text_JP/` packages. The config's
`data.text_module` selects the frontend ("text" = English, "text_JP" =
Japanese), mirroring the reference's dynamic import (data_utils.py:33-36).

Deviation (documented, SURVEY.md §7 quirk list): the reference's
`text/__init__.py:3` accidentally maps *English* cleaned text against the
*Japanese* symbol table. Here each frontend uses its own symbol table; for
importing checkpoints trained by the reference fork, select
text_module="text_JP" (which is what its trainer effectively used,
train_latest.py:38,98).
"""

from __future__ import annotations

from typing import List, Sequence

from mb_istft_vits_tpu.text import en, jp

_MODULES = {
    "text": en,
    "en": en,
    "text_JP": jp,
    "jp": jp,
}


def get_module(text_module: str):
    try:
        return _MODULES[text_module]
    except KeyError:
        raise ValueError(
            f"Unknown text_module {text_module!r}; expected one of "
            f"{sorted(_MODULES)}"
        )


def get_symbols(text_module: str = "text") -> List[str]:
    return get_module(text_module).symbols


def text_to_sequence(text: str, cleaner_names: Sequence[str],
                     text_module: str = "text") -> List[int]:
    return get_module(text_module).text_to_sequence(text, cleaner_names)


def cleaned_text_to_sequence(cleaned_text: str,
                             text_module: str = "text") -> List[int]:
    return get_module(text_module).cleaned_text_to_sequence(cleaned_text)


def intersperse(lst: List[int], item: int = 0) -> List[int]:
    """Insert blank tokens between symbols (reference commons.py:24-27)."""
    result = [item] * (len(lst) * 2 + 1)
    result[1::2] = lst
    return result


def frontend_ids(text: str, text_module: str, text_cleaners,
                 add_blank: bool, cleaned_text: bool) -> List[int]:
    """The full host-side text frontend: (cleaned_)text_to_sequence +
    optional blank interspersal (reference data_utils.py:89-98). One
    definition shared by live serving (SynthesisModule.text_to_ids) and
    exported-artifact serving (infer/export.py) so the two can never
    tokenize the same text differently."""
    if cleaned_text:
        ids = cleaned_text_to_sequence(text, text_module)
    else:
        ids = text_to_sequence(text, text_cleaners, text_module)
    if add_blank:
        ids = intersperse(ids, 0)
    return ids
