"""Text editing model (reference twin: bevy_text's editing machinery —
`bevy_text/src/editing.rs` + `cursor.rs`: cursor movement, anchored
selection, word jumps, selection-aware insert/delete — driven by
`bevy_ui_widgets` text_input).

Host-side state machine (editing is host-tier like all structural UI
state; the rendered glyph slots update in-jit from the value)."""

from __future__ import annotations

_WORD = set("abcdefghijklmnopqrstuvwxyz"
            "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_")


class TextEditState:
    """Cursor + anchored selection over a string (ref: editing.rs
    CursorPosition/Selection). `cursor` is a gap index 0..len; the
    selection spans cursor..anchor when they differ."""

    def __init__(self, value: str = "", max_len: int | None = None):
        self.value = value
        self.cursor = len(value)
        self.anchor = self.cursor          # == cursor: no selection
        self.max_len = max_len
        self._undo: list = []

    # -- selection helpers ------------------------------------------
    @property
    def has_selection(self) -> bool:
        return self.anchor != self.cursor

    @property
    def selection(self) -> tuple[int, int]:
        a, b = sorted((self.anchor, self.cursor))
        return a, b

    @property
    def selected_text(self) -> str:
        a, b = self.selection
        return self.value[a:b]

    def _set_cursor(self, pos: int, select: bool):
        pos = max(0, min(pos, len(self.value)))
        self.cursor = pos
        if not select:
            self.anchor = pos

    # -- movement (ref: cursor.rs move_* ops) -----------------------
    def left(self, select=False):
        if self.has_selection and not select:
            self._set_cursor(self.selection[0], False)
        else:
            self._set_cursor(self.cursor - 1, select)

    def right(self, select=False):
        if self.has_selection and not select:
            self._set_cursor(self.selection[1], False)
        else:
            self._set_cursor(self.cursor + 1, select)

    def home(self, select=False):
        self._set_cursor(0, select)

    def end(self, select=False):
        self._set_cursor(len(self.value), select)

    def word_left(self, select=False):
        i = self.cursor
        v = self.value
        while i > 0 and v[i - 1] not in _WORD:
            i -= 1
        while i > 0 and v[i - 1] in _WORD:
            i -= 1
        self._set_cursor(i, select)

    def word_right(self, select=False):
        i = self.cursor
        v = self.value
        n = len(v)
        while i < n and v[i] not in _WORD:
            i += 1
        while i < n and v[i] in _WORD:
            i += 1
        self._set_cursor(i, select)

    def select_all(self):
        self.anchor = 0
        self.cursor = len(self.value)

    # -- edits (selection-aware; ref: editing.rs apply_action) ------
    def _push_undo(self):
        self._undo.append((self.value, self.cursor, self.anchor))
        if len(self._undo) > 256:
            self._undo.pop(0)

    def undo(self):
        if self._undo:
            self.value, self.cursor, self.anchor = self._undo.pop()

    def _delete_selection(self):
        a, b = self.selection
        self.value = self.value[:a] + self.value[b:]
        self.cursor = self.anchor = a

    def insert(self, text: str):
        self._push_undo()
        if self.has_selection:
            self._delete_selection()
        if self.max_len is not None:
            room = self.max_len - len(self.value)
            text = text[:max(room, 0)]
        c = self.cursor
        self.value = self.value[:c] + text + self.value[c:]
        self.cursor = self.anchor = c + len(text)

    def backspace(self):
        self._push_undo()
        if self.has_selection:
            self._delete_selection()
        elif self.cursor > 0:
            c = self.cursor
            self.value = self.value[:c - 1] + self.value[c:]
            self.cursor = self.anchor = c - 1

    def delete(self):
        self._push_undo()
        if self.has_selection:
            self._delete_selection()
        elif self.cursor < len(self.value):
            c = self.cursor
            self.value = self.value[:c] + self.value[c + 1:]

    def cut(self) -> str:
        t = self.selected_text
        if t:
            self._push_undo()
            self._delete_selection()
        return t

    def display(self, show_cursor=True) -> str:
        """Value with a caret marker for the glyph-slot renderer (the
        in-jit slots show '|' at the gap; selections render via the
        widget's highlight quad, see ui.py)."""
        if not show_cursor:
            return self.value
        c = self.cursor
        return self.value[:c] + "|" + self.value[c:]
