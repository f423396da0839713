package graft.sql

import graft.SparkSpec
import graft.functions.CHFunctions
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** The served rename layer (roundCH/charCH/... spellings that dodge
  * Spark builtins, restored in result column names) must stay in sync
  * with the registry: a rename token whose target function was deleted
  * or renamed would silently dangle — the query would fail
  * UNRESOLVED_ROUTINE while the restore map still advertises the name.
  * Companion to the registry's own init-time key-uniqueness assert. */
class RegistryHygieneSpec extends SparkSpec {

  test("every restoreRenamedNames token has a registered target") {
    CHFunctions.register(spark)
    val reg = spark.sessionState.functionRegistry
    QueryGuard.renamedNameTokens.foreach { tok =>
      val name = tok.stripSuffix("(")
      assert(reg.functionExists(FunctionIdentifier(name)),
        s"rename token $tok has no registered function '$name'")
    }
  }

  test("rename tokens strip back to the CH-visible spelling") {
    QueryGuard.renamedNameTokens.foreach { tok =>
      assert(tok.endsWith("CH("), s"unexpected token shape: $tok")
    }
  }
}
