class CommentedMap(dict):
    """dict + no-op comment API (comments are cosmetic; see __init__.py)."""

    def yaml_add_eol_comment(self, comment, key=None, column=None):
        pass
