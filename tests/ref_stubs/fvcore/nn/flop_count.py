def flop_count(model, inputs, supported_ops=None):
    return {}, {}
