"""Framework exceptions (parity: /root/reference/capreolus/utils/exceptions.py:1-4)."""


class CapreolusTPUError(Exception):
    pass


class MissingDocError(CapreolusTPUError):
    def __init__(self, qid, docid):
        super().__init__(f"missing doc with qid={qid} docid={docid}")
        self.qid = qid
        self.docid = docid
