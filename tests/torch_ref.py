"""Faithful torch replicas of the reference models, used as parity oracles.

Built with the *installed* torch + transformers (4.x BertModel computes the
same math as the reference's vendored 2.2.2 BERT: post-LN, erf-gelu, additive
padding mask). Module names replicate the reference state-dict surface
exactly so `models/torch_import.py` maps them like released checkpoints:

* SpellBertPho2ResArch3 wiring: /root/reference/src/models.py:652-870
  (pho_embeddings/pho_gru/pho_model, char_images_multifonts, resnet,
  resnet_layernorm, gate_net, output_block with zeroed position ids,
  classifier tied to the word embeddings),
* arch4's softmax gate: src/models.py:1144-1148,
* SpellBertPho2Res merged fusion: src/models.py:382-511 (shared
  pho_res_model, raw res sum, integrate, 2-layer output block),
* Pho2Pretrain: src/models.py:1286-1347 (pho_model + cls2 MLM head),
* Pho2ResPretrain: src/models.py:1174-1284 (pho_res_model, RAW res sum —
  no LayerNorm — + cls2),
* ResPretrain: src/models.py:1349-1488 (resnet + cls3 linear),
* CharResNet block stack: src/char_cnn.py:9-74.

These are test oracles: the assertions in test_whole_model_parity.py are
meaningful only if this wiring matches the reference line-for-line, so keep
edits synchronized with the citations above.
"""

import torch
import torch.nn as nn
from transformers import BertConfig, BertModel
from transformers.models.bert.modeling_bert import BertOnlyMLMHead


def hf_config(cfg, num_layers):
    """Installed-transformers BertConfig for one of our RealiseConfig stacks."""
    return BertConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=num_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        hidden_act=cfg.hidden_act,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        max_position_embeddings=cfg.max_position_embeddings,
        type_vocab_size=cfg.type_vocab_size,
        layer_norm_eps=cfg.layer_norm_eps,
        attn_implementation="eager",
    )


class TorchBasicBlock(nn.Module):
    """conv3x3-BN-ReLU-conv3x3-BN + 1x1-conv-BN shortcut (char_cnn.py:9-32)."""

    def __init__(self, cin, cout, stride=2):
        super().__init__()
        self.residual_function = nn.Sequential(
            nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False),
            nn.BatchNorm2d(cout),
            nn.ReLU(inplace=True),
            nn.Conv2d(cout, cout, 3, padding=1, bias=False),
            nn.BatchNorm2d(cout),
        )
        self.shortcut = nn.Sequential(
            nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
            nn.BatchNorm2d(cout),
        )

    def forward(self, x):
        return nn.functional.relu(self.residual_function(x) + self.shortcut(x))


class TorchCharResNet(nn.Module):
    """5 stride-2 blocks, 32x32xF -> hidden (char_cnn.py:35-55), with the
    channel plan scaled off hidden_size exactly like ops/resnet._channels."""

    def __init__(self, in_channels=1, hidden_size=768):
        super().__init__()
        h = hidden_size
        chans = [max(h // 12, 1), max(h // 6, 1), max(h // 3, 1),
                 max((2 * h) // 3, 1), h]
        prev = in_channels
        for i, c in enumerate(chans, start=1):
            setattr(self, f"res_block{i}", TorchBasicBlock(prev, c))
            prev = c

    def forward(self, x):
        for i in range(1, 6):
            x = getattr(self, f"res_block{i}")(x)
        return x.reshape(x.shape[0], -1)   # 1x1 spatial squeeze


def _pho_gru(hidden_size):
    return nn.GRU(input_size=hidden_size, hidden_size=hidden_size,
                  num_layers=1, batch_first=True, dropout=0,
                  bidirectional=False)


def _gru_last_hidden(gru, pho_embeddings, pho_idx, pho_lens, b, s, h):
    """pack_padded GRU last hidden per token (src/models.py:818-826).
    The reference featurizer hands pho_idx/pho_lens already flattened to
    (B*S, P)/(B*S,); our batches keep (B, S, ...) — flatten here."""
    pho_idx = pho_idx.reshape(b * s, -1)
    pho_lens = pho_lens.reshape(b * s)
    emb = pho_embeddings(pho_idx)
    packed = nn.utils.rnn.pack_padded_sequence(
        emb, pho_lens.cpu(), batch_first=True, enforce_sorted=False)
    _, h_n = gru(packed)
    return h_n.squeeze(0).reshape(b, s, h)


class TorchSpellBert(nn.Module):
    """SpellBert (src/models.py:32-73): BERT -> dropout -> tied classifier."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.bert = BertModel(hf_config(cfg, cfg.num_hidden_layers))
        self.dropout = nn.Dropout(0.0)
        self.classifier = nn.Linear(cfg.hidden_size, cfg.vocab_size)

    def tie_cls_weight(self):
        self.classifier.weight = self.bert.embeddings.word_embeddings.weight

    def forward(self, batch):
        seq = self.bert(batch["src_idx"], attention_mask=batch["masks"])[0]
        logits = self.classifier(self.dropout(seq))
        if "tgt_idx" in batch:
            active = batch["loss_masks"].view(-1) == 1
            loss = nn.functional.cross_entropy(
                logits.view(-1, self.cfg.vocab_size)[active],
                batch["tgt_idx"].view(-1)[active])
            return loss, logits
        return logits


class TorchArch3(nn.Module):
    """SpellBertPho2ResArch3 (src/models.py:652-870); softmax_gate=True gives
    arch4 (src/models.py:1144-1148); mlm_head=True gives arch3-MLM with the
    untied ``cls`` BertOnlyMLMHead (src/models.py:912,1009)."""

    def __init__(self, cfg, pho2_vocab_size, softmax_gate=False,
                 mlm_head=False):
        super().__init__()
        self.cfg = cfg
        self.softmax_gate = softmax_gate
        self.mlm_head = mlm_head
        h = cfg.hidden_size
        self.bert = BertModel(hf_config(cfg, cfg.num_hidden_layers))
        self.pho_embeddings = nn.Embedding(pho2_vocab_size, h, padding_idx=0)
        self.pho_gru = _pho_gru(h)
        self.pho_model = BertModel(hf_config(cfg, cfg.pho_num_layers))
        self.char_images_multifonts = nn.Parameter(
            torch.rand(cfg.vocab_size, cfg.num_fonts, 32, 32),
            requires_grad=False)
        self.resnet = TorchCharResNet(cfg.num_fonts, h)
        self.resnet_layernorm = nn.LayerNorm(h, eps=cfg.layer_norm_eps)
        self.gate_net = nn.Linear(4 * h, 3)
        self.output_block = BertModel(hf_config(cfg, cfg.out_num_layers))
        self.dropout = nn.Dropout(0.0)
        if mlm_head:
            self.cls = BertOnlyMLMHead(hf_config(cfg, cfg.num_hidden_layers))
        else:
            self.classifier = nn.Linear(h, cfg.vocab_size)

    def tie_cls_weight(self):
        if not self.mlm_head:   # arch3-MLM has no tied classifier
            self.classifier.weight = self.bert.embeddings.word_embeddings.weight

    def forward(self, batch):
        input_ids = batch["src_idx"]
        attention_mask = batch["masks"]
        b, s = input_ids.shape
        h = self.cfg.hidden_size

        bert_hiddens = self.bert(input_ids, attention_mask=attention_mask)[0]
        pho_hiddens = _gru_last_hidden(
            self.pho_gru, self.pho_embeddings,
            batch["pho_idx"], batch["pho_lens"], b, s, h)
        pho_hiddens = self.pho_model(
            inputs_embeds=pho_hiddens, attention_mask=attention_mask)[0]

        src_idxs = input_ids.view(-1)
        images = self.char_images_multifonts.index_select(dim=0, index=src_idxs)
        res_hiddens = self.resnet(images).reshape(b, s, h)
        res_hiddens = self.resnet_layernorm(res_hiddens)

        m = attention_mask.to(torch.float).unsqueeze(2)
        mean = (bert_hiddens * m).sum(dim=1) / attention_mask.to(
            torch.float).sum(dim=1, keepdim=True)
        mean = mean.unsqueeze(1).expand(-1, s, -1)

        concat = torch.cat((bert_hiddens, pho_hiddens, res_hiddens, mean), -1)
        gated = self.gate_net(concat)
        if self.softmax_gate:
            g = torch.softmax(gated, dim=-1)
            g0, g1, g2 = g[..., 0:1], g[..., 1:2], g[..., 2:3]
        else:
            g0 = torch.sigmoid(gated[:, :, 0].unsqueeze(-1))
            g1 = torch.sigmoid(gated[:, :, 1].unsqueeze(-1))
            g2 = torch.sigmoid(gated[:, :, 2].unsqueeze(-1))
        hiddens = g0 * bert_hiddens + g1 * pho_hiddens + g2 * res_hiddens

        seq = self.output_block(
            inputs_embeds=hiddens,
            position_ids=torch.zeros_like(input_ids),
            attention_mask=attention_mask)[0]
        seq = self.dropout(seq)
        logits = self.cls(seq) if self.mlm_head else self.classifier(seq)

        if "tgt_idx" in batch:
            active = batch["loss_masks"].view(-1) == 1
            loss = nn.functional.cross_entropy(
                logits.view(-1, self.cfg.vocab_size)[active],
                batch["tgt_idx"].view(-1)[active])
            return loss, logits
        return logits


class TorchArch2(nn.Module):
    """SpellBertPho2ResArch2 (src/models.py:513-649): three separate streams,
    concat(3H) -> integrate, 2-layer output block with zeroed positions."""

    def __init__(self, cfg, pho2_vocab_size):
        super().__init__()
        self.cfg = cfg
        h = cfg.hidden_size
        self.bert = BertModel(hf_config(cfg, cfg.num_hidden_layers))
        self.pho_embeddings = nn.Embedding(pho2_vocab_size, h, padding_idx=0)
        self.pho_gru = _pho_gru(h)
        self.pho_model = BertModel(hf_config(cfg, cfg.pho_num_layers))
        self.char_images = nn.Embedding(cfg.vocab_size, 1024)
        self.char_images.weight.requires_grad = False
        self.resnet = TorchCharResNet(1, h)
        self.resnet_layernorm = nn.LayerNorm(h, eps=cfg.layer_norm_eps)
        self.integrate = nn.Linear(3 * h, h)
        self.output_block = BertModel(hf_config(cfg, cfg.out_num_layers))
        self.dropout = nn.Dropout(0.0)
        self.classifier = nn.Linear(h, cfg.vocab_size)

    def tie_cls_weight(self):
        self.classifier.weight = self.bert.embeddings.word_embeddings.weight

    def forward(self, batch):
        input_ids = batch["src_idx"]
        attention_mask = batch["masks"]
        b, s = input_ids.shape
        h = self.cfg.hidden_size

        bert_hiddens = self.bert(input_ids, attention_mask=attention_mask)[0]
        pho_hiddens = _gru_last_hidden(
            self.pho_gru, self.pho_embeddings,
            batch["pho_idx"], batch["pho_lens"], b, s, h)
        pho_hiddens = self.pho_model(
            inputs_embeds=pho_hiddens, attention_mask=attention_mask)[0]

        src_idxs = input_ids.view(-1)
        images = self.char_images(src_idxs).reshape(
            src_idxs.shape[0], 1, 32, 32)
        res_hiddens = self.resnet(images).reshape(b, s, h)
        res_hiddens = self.resnet_layernorm(res_hiddens)

        concat = torch.cat((bert_hiddens, pho_hiddens, res_hiddens), dim=-1)
        concat = self.integrate(concat)
        seq = self.output_block(
            inputs_embeds=concat,
            position_ids=torch.zeros_like(input_ids),
            attention_mask=attention_mask)[0]
        logits = self.classifier(self.dropout(seq))

        if "tgt_idx" in batch:
            active = batch["loss_masks"].view(-1) == 1
            loss = nn.functional.cross_entropy(
                logits.view(-1, self.cfg.vocab_size)[active],
                batch["tgt_idx"].view(-1)[active])
            return loss, logits
        return logits


class TorchMergedPho1(nn.Module):
    """SpellBertPho1 (src/models.py:75-161): summed initial/final/tone
    embeddings -> pho_model, concat+integrate, 2-layer output block. With
    ``with_res`` this becomes SpellBertPho1Res (src/models.py:251-380): raw
    resnet features summed into the pho embeddings pre the shared
    pho_res_model."""

    def __init__(self, cfg, pho1_vocab_size, with_res=False):
        super().__init__()
        self.cfg = cfg
        self.with_res = with_res
        h = cfg.hidden_size
        self.bert = BertModel(hf_config(cfg, cfg.num_hidden_layers))
        self.pho_embeddings = nn.Embedding(pho1_vocab_size, h, padding_idx=0)
        if with_res:
            self.char_images = nn.Embedding(cfg.vocab_size, 1024)
            self.char_images.weight.requires_grad = False
            self.resnet = TorchCharResNet(1, h)
            self.pho_res_model = BertModel(hf_config(cfg, cfg.pho_num_layers))
        else:
            self.pho_model = BertModel(hf_config(cfg, cfg.pho_num_layers))
        self.integrate = nn.Linear(2 * h, h)
        self.output_block = BertModel(hf_config(cfg, cfg.out_num_layers))
        self.dropout = nn.Dropout(0.0)
        self.classifier = nn.Linear(h, cfg.vocab_size)

    def tie_cls_weight(self):
        self.classifier.weight = self.bert.embeddings.word_embeddings.weight

    def forward(self, batch):
        input_ids = batch["src_idx"]
        attention_mask = batch["masks"]
        b, s = input_ids.shape
        h = self.cfg.hidden_size

        bert_outputs = self.bert(input_ids, attention_mask=attention_mask)[0]
        pho1 = batch["pho1_idx"]
        pho_embeddings = (self.pho_embeddings(pho1[..., 0])
                          + self.pho_embeddings(pho1[..., 1])
                          + self.pho_embeddings(pho1[..., 2]))
        if self.with_res:
            src_idxs = input_ids.view(-1)
            images = self.char_images(src_idxs).reshape(
                src_idxs.shape[0], 1, 32, 32)
            res = self.resnet(images).reshape(b, s, h)
            aux = self.pho_res_model(
                inputs_embeds=pho_embeddings + res,
                attention_mask=attention_mask)[0]
        else:
            aux = self.pho_model(
                inputs_embeds=pho_embeddings, attention_mask=attention_mask)[0]

        concat = self.integrate(torch.cat((bert_outputs, aux), dim=-1))
        seq = self.output_block(
            inputs_embeds=concat,
            position_ids=torch.zeros_like(input_ids),
            attention_mask=attention_mask)[0]
        logits = self.classifier(self.dropout(seq))

        if "tgt_idx" in batch:
            active = batch["loss_masks"].view(-1) == 1
            loss = nn.functional.cross_entropy(
                logits.view(-1, self.cfg.vocab_size)[active],
                batch["tgt_idx"].view(-1)[active])
            return loss, logits
        return logits


class TorchMergedPho2(nn.Module):
    """SpellBertPho2 (src/models.py:163-249): GRU hiddens -> pho_model,
    concat+integrate, 2-layer output block with zeroed positions."""

    def __init__(self, cfg, pho2_vocab_size):
        super().__init__()
        self.cfg = cfg
        h = cfg.hidden_size
        self.bert = BertModel(hf_config(cfg, cfg.num_hidden_layers))
        self.pho_embeddings = nn.Embedding(pho2_vocab_size, h, padding_idx=0)
        self.pho_gru = _pho_gru(h)
        self.pho_model = BertModel(hf_config(cfg, cfg.pho_num_layers))
        self.integrate = nn.Linear(2 * h, h)
        self.output_block = BertModel(hf_config(cfg, cfg.out_num_layers))
        self.dropout = nn.Dropout(0.0)
        self.classifier = nn.Linear(h, cfg.vocab_size)

    def tie_cls_weight(self):
        self.classifier.weight = self.bert.embeddings.word_embeddings.weight

    def forward(self, batch):
        input_ids = batch["src_idx"]
        attention_mask = batch["masks"]
        b, s = input_ids.shape
        h = self.cfg.hidden_size

        bert_outputs = self.bert(input_ids, attention_mask=attention_mask)[0]
        pho_hiddens = _gru_last_hidden(
            self.pho_gru, self.pho_embeddings,
            batch["pho_idx"], batch["pho_lens"], b, s, h)
        pho_hiddens = self.pho_model(
            inputs_embeds=pho_hiddens, attention_mask=attention_mask)[0]

        concat = self.integrate(
            torch.cat((bert_outputs, pho_hiddens), dim=-1))
        seq = self.output_block(
            inputs_embeds=concat,
            position_ids=torch.zeros_like(input_ids),
            attention_mask=attention_mask)[0]
        logits = self.classifier(self.dropout(seq))

        if "tgt_idx" in batch:
            active = batch["loss_masks"].view(-1) == 1
            loss = nn.functional.cross_entropy(
                logits.view(-1, self.cfg.vocab_size)[active],
                batch["tgt_idx"].view(-1)[active])
            return loss, logits
        return logits


class TorchMergedPho2Res(nn.Module):
    """SpellBertPho2Res (src/models.py:382-511): raw res features summed into
    the GRU hiddens before the shared pho_res_model, concat+integrate fusion,
    2-layer output block with zeroed positions."""

    def __init__(self, cfg, pho2_vocab_size):
        super().__init__()
        self.cfg = cfg
        h = cfg.hidden_size
        self.bert = BertModel(hf_config(cfg, cfg.num_hidden_layers))
        self.char_images = nn.Embedding(cfg.vocab_size, 1024)
        self.char_images.weight.requires_grad = False
        self.pho_embeddings = nn.Embedding(pho2_vocab_size, h, padding_idx=0)
        self.pho_gru = _pho_gru(h)
        self.resnet = TorchCharResNet(1, h)
        self.pho_res_model = BertModel(hf_config(cfg, cfg.pho_num_layers))
        self.integrate = nn.Linear(2 * h, h)
        self.output_block = BertModel(hf_config(cfg, cfg.out_num_layers))
        self.dropout = nn.Dropout(0.0)
        self.classifier = nn.Linear(h, cfg.vocab_size)

    def tie_cls_weight(self):
        self.classifier.weight = self.bert.embeddings.word_embeddings.weight

    def forward(self, batch):
        input_ids = batch["src_idx"]
        attention_mask = batch["masks"]
        b, s = input_ids.shape
        h = self.cfg.hidden_size

        bert_outputs = self.bert(input_ids, attention_mask=attention_mask)[0]
        pho_hiddens = _gru_last_hidden(
            self.pho_gru, self.pho_embeddings,
            batch["pho_idx"], batch["pho_lens"], b, s, h)

        src_idxs = input_ids.view(-1)
        images = self.char_images(src_idxs).reshape(
            src_idxs.shape[0], 1, 32, 32)
        res_hiddens = self.resnet(images).reshape(b, s, h)
        pho_res = pho_hiddens + res_hiddens      # RAW sum, no LayerNorm
        pho_res = self.pho_res_model(
            inputs_embeds=pho_res, attention_mask=attention_mask)[0]

        concat = torch.cat((bert_outputs, pho_res), dim=-1)
        concat = self.integrate(concat)
        seq = self.output_block(
            inputs_embeds=concat,
            position_ids=torch.zeros_like(input_ids),
            attention_mask=attention_mask)[0]
        logits = self.classifier(self.dropout(seq))

        if "tgt_idx" in batch:
            active = batch["loss_masks"].view(-1) == 1
            loss = nn.functional.cross_entropy(
                logits.view(-1, self.cfg.vocab_size)[active],
                batch["tgt_idx"].view(-1)[active])
            return loss, logits
        return logits


class TorchPho2Pretrain(nn.Module):
    """Pho2Pretrain (src/models.py:1286-1347): recover the char identity from
    pinyin alone — GRU -> pho_model -> cls2 MLM head; input is tgt_idx."""

    def __init__(self, cfg, pho2_vocab_size):
        super().__init__()
        self.cfg = cfg
        h = cfg.hidden_size
        self.pho_embeddings = nn.Embedding(pho2_vocab_size, h, padding_idx=0)
        self.pho_gru = _pho_gru(h)
        self.pho_model = BertModel(hf_config(cfg, cfg.pho_num_layers))
        self.cls2 = BertOnlyMLMHead(hf_config(cfg, cfg.pho_num_layers))

    def forward(self, batch):
        input_ids = batch["tgt_idx"]
        attention_mask = batch["masks"]
        b, s = input_ids.shape
        h = self.cfg.hidden_size
        pho_hiddens = _gru_last_hidden(
            self.pho_gru, self.pho_embeddings,
            batch["pho_idx"], batch["pho_lens"], b, s, h)
        seq = self.pho_model(
            inputs_embeds=pho_hiddens, attention_mask=attention_mask)[0]
        logits = self.cls2(seq)
        active = batch["loss_masks"].view(-1) == 1
        loss = nn.functional.cross_entropy(
            logits.view(-1, self.cfg.vocab_size)[active],
            input_ids.view(-1)[active])
        return loss, logits


class TorchPho2ResPretrain(nn.Module):
    """Pho2ResPretrain (src/models.py:1174-1284): GRU hiddens + RAW resnet
    features (no LayerNorm) -> shared pho_res_model -> cls2 MLM head."""

    def __init__(self, cfg, pho2_vocab_size):
        super().__init__()
        self.cfg = cfg
        h = cfg.hidden_size
        self.char_images = nn.Embedding(cfg.vocab_size, 1024)
        self.char_images.weight.requires_grad = False
        self.pho_embeddings = nn.Embedding(pho2_vocab_size, h, padding_idx=0)
        self.pho_gru = _pho_gru(h)
        self.resnet = TorchCharResNet(1, h)
        self.pho_res_model = BertModel(hf_config(cfg, cfg.pho_num_layers))
        self.cls2 = BertOnlyMLMHead(hf_config(cfg, cfg.pho_num_layers))

    def forward(self, batch):
        input_ids = batch["tgt_idx"]
        attention_mask = batch["masks"]
        b, s = input_ids.shape
        h = self.cfg.hidden_size
        pho_hiddens = _gru_last_hidden(
            self.pho_gru, self.pho_embeddings,
            batch["pho_idx"], batch["pho_lens"], b, s, h)
        src_idxs = input_ids.view(-1)
        images = self.char_images(src_idxs).reshape(
            src_idxs.shape[0], 1, 32, 32)
        res_hiddens = self.resnet(images).reshape(b, s, h)
        seq = self.pho_res_model(
            inputs_embeds=pho_hiddens + res_hiddens,
            attention_mask=attention_mask)[0]
        logits = self.cls2(seq)
        active = batch["loss_masks"].view(-1) == 1
        loss = nn.functional.cross_entropy(
            logits.view(-1, self.cfg.vocab_size)[active],
            input_ids.view(-1)[active])
        return loss, logits


class TorchResPretrain(nn.Module):
    """ResPretrain (src/models.py:1349-1488): glyph stack -> CharResNet ->
    cls3 linear; labels are the char ids themselves."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.char_images_multifonts = nn.Parameter(
            torch.rand(cfg.vocab_size, cfg.num_fonts, 32, 32),
            requires_grad=False)
        self.resnet = TorchCharResNet(cfg.num_fonts, cfg.hidden_size)
        self.dropout = nn.Dropout(0.0)
        self.cls3 = nn.Linear(cfg.hidden_size, cfg.vocab_size)

    def forward(self, char_idx):
        images = self.char_images_multifonts.index_select(dim=0, index=char_idx)
        feats = self.resnet(images)
        logits = self.cls3(self.dropout(feats))
        loss = nn.functional.cross_entropy(logits, char_idx)
        return loss, logits


def numpy_state_dict(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}
